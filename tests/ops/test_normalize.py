import jax.numpy as jnp
import numpy as np

from audiogan_tpu.ops import normalize_amplitude


def test_peak(rng):
    x = jnp.asarray(rng.standard_normal((3, 500)).astype(np.float32)) * 0.1
    y = np.asarray(normalize_amplitude(x, "peak", 0.999))
    np.testing.assert_allclose(np.abs(y).max(axis=-1), 0.999, rtol=1e-5)


def test_rms(rng):
    x = jnp.asarray(rng.standard_normal((3, 500)).astype(np.float32)) * 3.0
    y = np.asarray(normalize_amplitude(x, "rms", 0.1))
    np.testing.assert_allclose(np.sqrt((y ** 2).mean(axis=-1)), 0.1, rtol=1e-4)


def test_silence_passthrough():
    x = jnp.zeros((2, 100), jnp.float32)
    y = np.asarray(normalize_amplitude(x, "peak"))
    np.testing.assert_array_equal(y, 0.0)


def test_none(rng):
    x = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))
    assert normalize_amplitude(x, "none") is x
