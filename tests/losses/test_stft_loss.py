import jax.numpy as jnp
import numpy as np

from audiogan_tpu.losses import (batch_spectral_matching_loss,
                                 multi_resolution_stft_loss)

RES = ((128, 32, 128), (256, 64, 256))


def test_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    assert float(multi_resolution_stft_loss(x, x, RES)) < 1e-6
    assert float(batch_spectral_matching_loss(x, x, RES)) < 1e-6


def test_positive_and_ordered(rng):
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    y_near = x + 0.01 * jnp.asarray(
        rng.standard_normal((2, 2048)).astype(np.float32))
    y_far = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    near = float(multi_resolution_stft_loss(x, y_near, RES))
    far = float(multi_resolution_stft_loss(x, y_far, RES))
    assert 0 < near < far


def test_gradient_flows(rng):
    import jax
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    g = jax.grad(lambda v: multi_resolution_stft_loss(v, y, RES))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_accepts_nwc(rng):
    x = jnp.asarray(rng.standard_normal((2, 2048, 1)).astype(np.float32))
    assert float(multi_resolution_stft_loss(x, x, RES)) < 1e-6
