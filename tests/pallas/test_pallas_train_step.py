"""Full WGAN-GP train step with kernels='pallas' (interpret mode on CPU):
the integration point of SURVEY M4 — conv primitives under scan + GP
double-backprop + optimizers, numerically close to the XLA path."""

import dataclasses

import jax
import numpy as np

from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step

from helpers_train import raw_batch, tiny_config


def _cfg(kernels):
    cfg = tiny_config()
    # widen channels so the pallas path (Cin >= 8) is actually exercised
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, model_dim=8, max_channels=32),
        train=dataclasses.replace(cfg.train, kernels=kernels),
    )
    return cfg


def test_train_step_pallas_matches_xla():
    cfg_p, cfg_x = _cfg("pallas"), _cfg("xla")
    state_p = create_train_state(cfg_p)
    state_x = create_train_state(cfg_x)
    # identical seeds -> identical params
    for a, b in zip(jax.tree.leaves(state_p.params_g),
                    jax.tree.leaves(state_x.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_p = jax.jit(build_train_step(cfg_p))
    step_x = jax.jit(build_train_step(cfg_x))
    for s in range(2):
        clips, labels = raw_batch(cfg_p, seed=1000 + s)
        state_p, mp = step_p(state_p, clips, labels)
        state_x, mx = step_x(state_x, clips, labels)
    mp, mx = jax.device_get(mp), jax.device_get(mx)
    for k in mx:
        assert np.isfinite(mp[k]), k
        np.testing.assert_allclose(mp[k], mx[k], rtol=2e-2, atol=2e-3,
                                   err_msg=k)


def test_train_step_mixed_tier_matches_xla():
    """train.kernels_g='pallas' with an xla critic (the measured-fastest
    tier on HW, BASELINE.md) — the per-net override must produce the same
    training math."""
    cfg_m = dataclasses.replace(
        _cfg("xla"),
        train=dataclasses.replace(_cfg("xla").train, kernels_g="pallas"))
    cfg_x = _cfg("xla")
    state_m = create_train_state(cfg_m)
    state_x = create_train_state(cfg_x)
    step_m = jax.jit(build_train_step(cfg_m))
    step_x = jax.jit(build_train_step(cfg_x))
    clips, labels = raw_batch(cfg_m, seed=77)
    state_m, mm = step_m(state_m, clips, labels)
    state_x, mx = step_x(state_x, clips, labels)
    mm, mx = jax.device_get(mm), jax.device_get(mx)
    for k in mx:
        np.testing.assert_allclose(mm[k], mx[k], rtol=2e-2, atol=2e-3,
                                   err_msg=k)


def test_ingest_tier_step_equality():
    """kernels_ingest=pallas vs xla inside the FULL training step: both
    draw crops from ops.framing.crop_offsets, so every metric matches."""
    hist = {}
    for tier in ("xla", "pallas"):
        base = tiny_config()
        cfg = dataclasses.replace(
            base, train=dataclasses.replace(
                base.train, kernels="xla", kernels_ingest=tier))
        state = create_train_state(cfg)
        step = jax.jit(build_train_step(cfg))
        clips, labels = raw_batch(cfg, seed=0)
        state, m = step(state, clips, labels)
        state, m = step(state, clips, labels)
        hist[tier] = jax.device_get(m)
    for k in hist["xla"]:
        np.testing.assert_allclose(hist["pallas"][k], hist["xla"][k],
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_cp_step_pallas_tier_traces():
    """cfg.train.kernels now reaches the cp step's halo convs (the r3
    review found the cp path hardwired to xla). Full pallas-tier cp
    EXECUTION is unverifiable in CI: interpret-mode pallas kernel bodies
    cannot be discharged inside a vma-checked shard_map (JAX raises
    'Primitive mul requires varying manual axes to match' from the
    hlo_interpreter — kernel bodies carry no pvary plumbing), and the
    compiled path needs >1 real TPU chip. What CI CAN pin: the cp=2
    pallas step traces end-to-end — every pallas_call's out_shape now
    carries the shard-varying vma of its operands (kernels _vma_sds),
    which is the piece that used to fail at trace time. The compiled
    shard_map+pallas mechanism itself runs on HW at cp=1
    (scripts/verify_session.py flow cp_pallas)."""
    import numpy as np
    from jax.sharding import Mesh

    from audiogan_tpu.config import MeshCfg
    from audiogan_tpu.train.cp_step import build_cp_train_step

    base = _cfg("pallas")
    cfg = dataclasses.replace(
        base, mesh=MeshCfg(dp=1, cp=2),
        model=dataclasses.replace(base.model, phase_shuffle=0))
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                ("data", "cp"))
    state = create_train_state(cfg)
    step = build_cp_train_step(cfg, mesh)(state)
    clips, labels = raw_batch(cfg, seed=5)
    out = jax.eval_shape(step, state, clips, labels)
    new_state_shape, metrics_shape = out
    assert set(metrics_shape) >= {"d_loss", "g_loss", "gp"}
