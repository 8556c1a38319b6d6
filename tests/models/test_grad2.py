"""Second-order AD through the full discriminators — THE critical test
(SURVEY §4.3): the WGAN-GP loss differentiates grad_x D(x) w.r.t. params,
so every op in every critic must compose under reverse-over-reverse AD.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from audiogan_tpu.losses import gradient_penalty
from audiogan_tpu.models import (DualDiscriminator, GRUGenerator,
                                 WaveGANDiscriminator, WaveGANGenerator)


def _gp_loss_grad(d, params, real, fake, rngs):
    def loss(p):
        d_apply = lambda x: d.apply(p, x, train=True, rngs=rngs)
        gp, _ = gradient_penalty(d_apply, real, fake, jax.random.key(9))
        return gp
    return jax.grad(loss)(params)


def test_wavegan_d_second_order_through_gp():
    d = WaveGANDiscriminator(model_dim=4, kernel_size=9, strides=(4, 4),
                             phase_shuffle_rad=1, max_channels=16)
    real = jax.random.normal(jax.random.key(0), (2, 256, 1))
    fake = jax.random.normal(jax.random.key(1), (2, 256, 1))
    rngs = {"phase_shuffle": jax.random.key(2)}
    params = d.init({"params": jax.random.key(3), **rngs}, real)
    g = _gp_loss_grad(d, params, real, fake, rngs)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0


def test_dual_d_second_order_through_gp():
    d = DualDiscriminator(model_dim=4, kernel_size=9, strides=(4, 4),
                          phase_shuffle_rad=1, max_channels=16,
                          stft_resolution=(64, 16, 64))
    real = jax.random.normal(jax.random.key(0), (2, 256, 1))
    fake = jax.random.normal(jax.random.key(1), (2, 256, 1))
    rngs = {"phase_shuffle": jax.random.key(2)}
    params = d.init({"params": jax.random.key(3), **rngs}, real)
    g = _gp_loss_grad(d, params, real, fake, rngs)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0


def test_d_check_grads_order2():
    # numerical check of D's input-gradient path (small sizes, rev mode)
    d = WaveGANDiscriminator(model_dim=2, kernel_size=5, strides=(4,),
                             phase_shuffle_rad=0, max_channels=8)
    x = jax.random.normal(jax.random.key(0), (1, 64, 1))
    params = d.init({"params": jax.random.key(1)}, x, train=False)
    f = lambda v: jnp.sum(d.apply(params, v, train=False))
    check_grads(f, (x,), order=2, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_generators_first_order():
    g = WaveGANGenerator(clip_len=256, latent_dim=8, model_dim=4,
                         kernel_size=9, strides=(4, 4), max_channels=16)
    z = jax.random.normal(jax.random.key(0), (2, 8))
    params = g.init(jax.random.key(1), z)
    grads = jax.grad(lambda p: jnp.sum(g.apply(p, z) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(grads))

    gg = GRUGenerator(clip_len=256, latent_dim=8, model_dim=4, hidden=16,
                      frame_size=64, kernel_size=9)
    gparams = gg.init(jax.random.key(2), z)
    ggrads = jax.grad(lambda p: jnp.sum(gg.apply(p, z) ** 2))(gparams)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(ggrads))
