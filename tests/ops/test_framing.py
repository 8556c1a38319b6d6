import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.ops import random_crop, center_crop


def test_random_crop_shapes_and_content(rng):
    x = jnp.asarray(rng.standard_normal((4, 100)).astype(np.float32))
    key = jax.random.key(0)
    y = random_crop(x, key, 64)
    assert y.shape == (4, 64)
    # every output row must be a contiguous slice of the input row
    xn, yn = np.asarray(x), np.asarray(y)
    for b in range(4):
        found = any(np.array_equal(yn[b], xn[b, o:o + 64]) for o in range(37))
        assert found


def test_random_crop_pads_short(rng):
    x = jnp.asarray(rng.standard_normal((2, 50)).astype(np.float32))
    y = random_crop(x, jax.random.key(1), 64)
    assert y.shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(y)[:, :50], np.asarray(x))
    np.testing.assert_array_equal(np.asarray(y)[:, 50:], 0.0)


def test_random_crop_deterministic(rng):
    x = jnp.asarray(rng.standard_normal((4, 100)).astype(np.float32))
    k = jax.random.key(7)
    np.testing.assert_array_equal(np.asarray(random_crop(x, k, 64)),
                                  np.asarray(random_crop(x, k, 64)))


def test_center_crop(rng):
    x = jnp.asarray(np.arange(10, dtype=np.float32)[None])
    y = center_crop(x, 4)
    np.testing.assert_array_equal(np.asarray(y)[0], [3, 4, 5, 6])
