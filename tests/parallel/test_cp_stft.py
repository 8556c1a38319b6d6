"""CP dual (wave + STFT) critic: hop-aligned framing + (win-hop) halo ==
the unsharded DualDiscriminator (SURVEY §5 STFT clause; [B:10] at cp>1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audiogan_tpu.config import MeshCfg, ModelCfg
from audiogan_tpu.models import build_discriminator
from audiogan_tpu.parallel.cp_models import cp_discriminator_forward

from helpers_train import tiny_config

CP = 4


def _dual_cfg(num_classes=0, **mesh_kw):
    cfg = tiny_config(model=ModelCfg(
        generator="wavegan", model_dim=4, kernel_size=9, strides=(4, 4, 4),
        max_channels=16, use_stft_critic=True,
        stft_resolutions=((32, 16, 32),)))
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, clip_len=4096,
                                      store_len=4608,
                                      num_classes=num_classes))
    if mesh_kw:
        cfg = dataclasses.replace(cfg, mesh=MeshCfg(**mesh_kw))
    return cfg.validate()


def _mesh():
    return Mesh(np.asarray(jax.devices()[:CP]), ("cp",))


def _setup(num_classes=0):
    cfg = _dual_cfg(num_classes)
    d = build_discriminator(cfg)
    x = jax.random.normal(jax.random.key(0), (2, cfg.data.clip_len, 1))
    labels = jnp.array([1, 7], jnp.int32) if num_classes else None
    params = (d.init({"params": jax.random.key(1)}, x, labels, train=False)
              if num_classes
              else d.init({"params": jax.random.key(1)}, x, train=False))
    return cfg, d, params, x, labels


def test_cp_dual_critic_matches_unsharded():
    cfg, d, params, x, _ = _setup()
    want = d.apply(params, x, train=False)
    fn = shard_map(
        lambda p, v: cp_discriminator_forward(p, v, cfg, "cp"),
        mesh=_mesh(), in_specs=(P(), P(None, "cp", None)), out_specs=P())
    got = jax.jit(fn)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_cp_dual_critic_conditional():
    cfg, d, params, x, labels = _setup(num_classes=10)
    want = d.apply(params, x, labels, train=False)
    fn = shard_map(
        lambda p, v, y: cp_discriminator_forward(p, v, cfg, "cp", labels=y),
        mesh=_mesh(), in_specs=(P(), P(None, "cp", None), P()),
        out_specs=P())
    got = jax.jit(fn)(params, x, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_cp_step_dual_stft_matches_unsharded():
    """Full CP train step with the dual critic == the batch-parallel step
    (phase shuffle off, dp=1 cp=4): [B:10] trains across chips."""
    from audiogan_tpu.train.cp_step import build_cp_train_step
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step
    from helpers_train import raw_batch

    cfg = _dual_cfg(dp=1, cp=CP)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, phase_shuffle=0))
    devs = np.asarray(jax.devices()[:CP]).reshape(1, CP)
    mesh = Mesh(devs, ("data", "cp"))

    state = create_train_state(cfg)
    step = build_cp_train_step(cfg, mesh)(state)
    clips, labels = raw_batch(cfg, seed=100)
    state, m_cp = step(state, clips, labels)
    m_cp = jax.device_get(m_cp)

    ref_mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("data", "cp"))
    body = build_train_step(cfg, axis_name="data")
    state_r = create_train_state(cfg)
    specs = jax.tree.map(lambda _: P(), state_r)
    fn = jax.jit(jax.shard_map(
        body, mesh=ref_mesh,
        in_specs=(specs, P(None, "data", None), P(None, "data")),
        out_specs=(specs, P()), check_vma=True))
    _, m_ref = fn(state_r, clips, labels)
    m_ref = jax.device_get(m_ref)

    for k in ("d_loss", "w_dist", "gp", "gp_grad_norm", "g_loss"):
        np.testing.assert_allclose(m_cp[k], m_ref[k], rtol=1e-3, atol=1e-5,
                                   err_msg=k)
