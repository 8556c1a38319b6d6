"""Model-level TP: channel-parallel critic == the unsharded flax module,
for values and WGAN-GP-style gradients (SURVEY §2.3 TP row, wired)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audiogan_tpu.models import build_discriminator
from audiogan_tpu.parallel.tp_models import tp_discriminator_forward

from helpers_train import tiny_config

TP = 4


def _mesh():
    return Mesh(np.asarray(jax.devices()[:TP]), ("tp",))


def _setup(num_classes=0):
    cfg = tiny_config()
    if num_classes:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, num_classes=num_classes))
    d = build_discriminator(cfg)
    x = jax.random.normal(jax.random.key(0), (2, cfg.data.clip_len, 1))
    labels = jnp.array([1, 7], jnp.int32) if num_classes else None
    params = (d.init({"params": jax.random.key(1)}, x, labels, train=False)
              if num_classes
              else d.init({"params": jax.random.key(1)}, x, train=False))
    return cfg, d, params, x, labels


def test_tp_critic_matches_unsharded_eval():
    cfg, d, params, x, _ = _setup()
    want = d.apply(params, x, train=False)
    fn = shard_map(
        functools.partial(tp_discriminator_forward, cfg=cfg, axis="tp"),
        mesh=_mesh(), in_specs=(P(), P()), out_specs=P())
    got = jax.jit(fn)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_tp_critic_conditional_matches():
    cfg, d, params, x, labels = _setup(num_classes=10)
    want = d.apply(params, x, labels, train=False)
    fn = shard_map(
        lambda p, v, y: tp_discriminator_forward(p, v, cfg, "tp", labels=y),
        mesh=_mesh(), in_specs=(P(), P(), P()), out_specs=P())
    got = jax.jit(fn)(params, x, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_tp_critic_shuffle_deterministic():
    cfg, d, params, x, _ = _setup()
    key = jax.random.key(9)
    fn = shard_map(
        lambda p, v, k: tp_discriminator_forward(p, v, cfg, "tp", k),
        mesh=_mesh(), in_specs=(P(), P(), P()), out_specs=P())
    a = jax.jit(fn)(params, x, key)
    b = jax.jit(fn)(params, x, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_wgan_gp_grads_through_tp_critic_match():
    """The TP critic is trainable: d(WGAN-GP loss)/d(params) through the
    channel-parallel forward (grad through the col/row psums + head psum)
    equals the unsharded gradient."""
    from audiogan_tpu.losses import gradient_penalty, wgan_d_loss
    cfg, d, params, x, _ = _setup()
    fake = jax.random.normal(jax.random.key(5), x.shape)

    def loss_unsharded(p):
        d_apply = lambda v: d.apply(p, v, train=False)
        gp, _ = gradient_penalty(d_apply, x, fake, jax.random.key(7))
        return wgan_d_loss(d_apply(x), d_apply(fake)) + 10.0 * gp

    tp_fwd = shard_map(
        lambda p, v: tp_discriminator_forward(p, v, cfg, "tp"),
        mesh=_mesh(), in_specs=(P(), P()), out_specs=P())

    def loss_tp(p):
        d_apply = lambda v: tp_fwd(p, v)
        gp, _ = gradient_penalty(d_apply, x, fake, jax.random.key(7))
        return wgan_d_loss(d_apply(x), d_apply(fake)) + 10.0 * gp

    v1, g1 = jax.jit(jax.value_and_grad(loss_unsharded))(params)
    v2, g2 = jax.jit(jax.value_and_grad(loss_tp))(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-3)
