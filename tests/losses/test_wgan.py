import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.losses import gradient_penalty, wgan_d_loss, wgan_g_loss


def test_value_function_closed_form():
    real = jnp.asarray([1.0, 3.0])
    fake = jnp.asarray([0.0, 1.0])
    assert float(wgan_d_loss(real, fake)) == 0.5 - 2.0
    assert float(wgan_g_loss(fake)) == -0.5


def test_gp_linear_critic_closed_form(rng):
    # D(x) = <w, x>: grad_x D = w everywhere, so gp = (||w|| - 1)^2 exactly.
    w = jnp.asarray(rng.standard_normal((64, 1)).astype(np.float32))
    d_apply = lambda x: jnp.sum(x * w, axis=(1, 2))
    real = jnp.asarray(rng.standard_normal((8, 64, 1)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((8, 64, 1)).astype(np.float32))
    gp, norm = gradient_penalty(d_apply, real, fake, jax.random.key(0))
    wn = float(jnp.linalg.norm(w))
    np.testing.assert_allclose(float(gp), (wn - 1.0) ** 2, rtol=1e-5)
    np.testing.assert_allclose(float(norm), wn, rtol=1e-5)


def test_gp_is_differentiable_wrt_params(rng):
    # the double-backprop path: d(gp)/d(theta) exists and is finite
    theta = jnp.asarray(rng.standard_normal((32, 1)).astype(np.float32))
    real = jnp.asarray(rng.standard_normal((4, 32, 1)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((4, 32, 1)).astype(np.float32))

    def loss(th):
        d_apply = lambda x: jnp.tanh(jnp.sum(x * th, axis=(1, 2))) ** 2
        gp, _ = gradient_penalty(d_apply, real, fake, jax.random.key(0))
        return gp

    g = jax.grad(loss)(theta)
    assert g.shape == theta.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_gp_chunked_matches_unchunked(rng):
    import jax
    w = jnp.asarray(rng.standard_normal((32, 1)).astype(np.float32))
    d_apply = lambda x: jnp.tanh(jnp.sum(x * w, axis=(1, 2)))
    real = jnp.asarray(rng.standard_normal((8, 32, 1)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((8, 32, 1)).astype(np.float32))
    k = jax.random.key(2)
    gp1, n1 = gradient_penalty(d_apply, real, fake, k, batch_chunks=1)
    gp4, n4 = gradient_penalty(d_apply, real, fake, k, batch_chunks=4)
    np.testing.assert_allclose(float(gp1), float(gp4), rtol=1e-6)
    np.testing.assert_allclose(float(n1), float(n4), rtol=1e-6)

    # and it stays differentiable wrt closed-over params through lax.map
    def loss(th):
        d = lambda x: jnp.tanh(jnp.sum(x * th, axis=(1, 2)))
        gp, _ = gradient_penalty(d, real, fake, k, batch_chunks=4)
        return gp
    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
