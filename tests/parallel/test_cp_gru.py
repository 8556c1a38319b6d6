"""CP GRU generator: ppermute carry handoff == the unsharded module
(SURVEY §2.3 CP row / §5 long-context; [B:9] family spanning chips)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audiogan_tpu.config import MeshCfg, ModelCfg
from audiogan_tpu.models import build_generator
from audiogan_tpu.parallel.cp_models import cp_gru_generator_forward

from helpers_train import tiny_config

CP = 4


def _mesh():
    return Mesh(np.asarray(jax.devices()[:CP]), ("cp",))


def _gru_cfg(num_classes=0, **mesh_kw):
    cfg = tiny_config(model=ModelCfg(generator="gru", model_dim=4,
                                     kernel_size=9, strides=(4, 4, 4),
                                     max_channels=16, gru_frame_size=16,
                                     gru_hidden=16, latent_dim=8))
    if num_classes:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, num_classes=num_classes))
    if mesh_kw:
        cfg = dataclasses.replace(cfg, mesh=MeshCfg(**mesh_kw))
    return cfg.validate()


def _setup(num_classes=0):
    cfg = _gru_cfg(num_classes)
    g = build_generator(cfg)
    z = jax.random.normal(jax.random.key(0), (2, cfg.model.latent_dim))
    labels = jnp.array([1, 7], jnp.int32) if num_classes else None
    params = (g.init(jax.random.key(1), z, labels) if num_classes
              else g.init(jax.random.key(1), z))
    return cfg, g, params, z, labels


def test_cp_gru_forward_matches_unsharded():
    cfg, g, params, z, _ = _setup()
    want = g.apply(params, z)                       # [B, T, 1]

    fn = shard_map(
        functools.partial(cp_gru_generator_forward, cfg=cfg, axis="cp"),
        mesh=_mesh(), in_specs=(P(), P()), out_specs=P(None, "cp", None))
    got = jax.jit(fn)(params, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_cp_gru_forward_conditional():
    cfg, g, params, z, labels = _setup(num_classes=10)
    want = g.apply(params, z, labels)
    fn = shard_map(
        lambda p, v, y: cp_gru_generator_forward(p, v, cfg, "cp", labels=y),
        mesh=_mesh(), in_specs=(P(), P(), P()),
        out_specs=P(None, "cp", None))
    got = jax.jit(fn)(params, z, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_cp_gru_grads_match_unsharded():
    """Sharded param grads == unsharded grads: the carry handoff (incl. the
    autoregressive prev_feat) differentiates exactly. Under vma-checked
    shard_map the grads of the replicated params arrive already psum'd over
    cp (the auto-inserted transpose collective — see train/step.py
    _replica_mean), so no explicit psum: this also pins THAT semantics."""
    cfg, g, params, z, _ = _setup()

    def loss_ref(p):
        y = g.apply(p, z)
        return jnp.sum(y * y)

    want = jax.grad(loss_ref)(params)

    def grads_cp(p, zz):
        def loss_local(q):
            y_loc = cp_gru_generator_forward(q, zz, cfg, "cp")
            return jnp.sum(y_loc * y_loc)

        return jax.grad(loss_local)(p)

    fn = shard_map(grads_cp, mesh=_mesh(), in_specs=(P(), P()),
                   out_specs=P())
    got = jax.jit(fn)(params, z)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4),
        got, want)


def test_cp_step_gru_matches_unsharded():
    """Full CP train step with the GRU generator == the batch-parallel step
    (phase shuffle off, dp=1 cp=4)."""
    from audiogan_tpu.train.cp_step import build_cp_train_step
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step
    from helpers_train import raw_batch

    cfg = _gru_cfg(dp=1, cp=CP)
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
        np.testing.assert_allclose(m_cp[k], m_ref[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)
