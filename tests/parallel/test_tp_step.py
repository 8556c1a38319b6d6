"""Tensor-parallel train step == unsharded step (phase shuffle off, shared
tp keys): TP as a USABLE training strategy (VERDICT r2 #4), not just the
forward-equality proof of test_tp_model.py."""

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

from audiogan_tpu.config import MeshCfg
from audiogan_tpu.parallel.mesh import make_mesh
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step
from audiogan_tpu.train.tp_step import build_tp_train_step

from helpers_train import raw_batch, tiny_config


def _cfg(dp, tp, shuffle=0, num_classes=0):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, num_classes=num_classes),
        model=dataclasses.replace(cfg.model, phase_shuffle=shuffle),
        mesh=MeshCfg(dp=dp, tp=tp),
        train=dataclasses.replace(cfg.train, batch_size=2 * dp),
    ).validate()


def _run_tp(cfg, steps=2):
    mesh = make_mesh(cfg)
    assert mesh.axis_names == ("data", "cp", "tp")
    state = create_train_state(cfg)
    step = build_tp_train_step(cfg, mesh)(state)
    hist = []
    for s in range(steps):
        clips, labels = raw_batch(cfg, seed=100 + s)
        state, m = step(state, clips, labels)
        hist.append(jax.device_get(m))
    return state, hist


def test_tp_step_matches_unsharded():
    """dp=1, tp=4 vs the plain step body shard_map'd on one device: with
    shuffle off the per-replica key folding matches, so the math must
    agree (the channel slicing + psums are exact)."""
    cfg = _cfg(dp=1, tp=4)
    _, h_tp = _run_tp(cfg)

    from jax.sharding import PartitionSpec as P
    ref_mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("data", "cp"))
    body = build_train_step(cfg, axis_name="data")
    state = create_train_state(cfg)
    specs = jax.tree.map(lambda _: P(), state)
    fn = jax.jit(jax.shard_map(
        body, mesh=ref_mesh,
        in_specs=(specs, P(None, "data", None), P(None, "data")),
        out_specs=(specs, P()), check_vma=True))
    h_ref = []
    for s in range(2):
        clips, labels = raw_batch(cfg, seed=100 + s)
        state, m = fn(state, clips, labels)
        h_ref.append(jax.device_get(m))

    for mt, mr in zip(h_tp, h_ref):
        for k in ("d_loss", "w_dist", "gp", "gp_grad_norm", "g_loss"):
            np.testing.assert_allclose(mt[k], mr[k], rtol=5e-4, atol=1e-5,
                                       err_msg=k)


def test_tp_step_with_dp_and_shuffle_runs():
    cfg = _cfg(dp=2, tp=2, shuffle=1)
    state, hist = _run_tp(cfg)
    assert int(state.step) == 2
    assert all(np.isfinite(v) for m in hist for v in m.values())


def test_tp_step_conditional_runs():
    cfg = _cfg(dp=1, tp=2, num_classes=10)
    state, hist = _run_tp(cfg, steps=1)
    assert all(np.isfinite(v) for m in hist for v in m.values())


def test_validate_rejects_bad_tp():
    import pytest
    with pytest.raises(ValueError, match="divisible by tp"):
        _cfg(dp=1, tp=3)
    with pytest.raises(ValueError, match="cp>1"):
        cfg = tiny_config()
        dataclasses.replace(cfg, mesh=MeshCfg(dp=1, cp=2, tp=2)).validate()


def test_tp_step_stft_loss_matches_unsharded():
    """The G spectral-matching term under tp (full-length, tp-replicated
    clips -> the plain loss) — the term the r3 review found silently
    dropped from tp_step's g_loss. Reference: the plain step body (which
    has always had the term) shard_map'd on one device."""
    from jax.sharding import PartitionSpec as P
    cfg = _cfg(dp=1, tp=2)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, stft_resolutions=((128, 32, 128), (256, 64, 256))),
        loss=dataclasses.replace(cfg.loss, stft_loss_weight=1.0))
    _, h_tp = _run_tp(cfg)

    ref_mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("data", "cp"))
    body = build_train_step(cfg, axis_name="data")
    state = create_train_state(cfg)
    specs = jax.tree.map(lambda _: P(), state)
    fn = jax.jit(jax.shard_map(
        body, mesh=ref_mesh,
        in_specs=(specs, P(None, "data", None), P(None, "data")),
        out_specs=(specs, P()), check_vma=True))
    h_ref = []
    for s in range(2):
        clips, labels = raw_batch(cfg, seed=100 + s)
        state, m = fn(state, clips, labels)
        h_ref.append(jax.device_get(m))

    for mt, mr in zip(h_tp, h_ref):
        for k in ("d_loss", "g_loss", "stft_loss"):
            np.testing.assert_allclose(mt[k], mr[k], rtol=5e-4, atol=1e-5,
                                       err_msg=k)


def test_tp_fsdp_matches_replicated():
    """tp composed with ZeRO-1 optimizer sharding (mesh.zero1_update):
    bit-equivalent metrics, and the Adam state really lands sharded."""
    from audiogan_tpu.parallel.mesh import fsdp_shardable

    cfg = _cfg(dp=2, tp=2)
    cfg_f = dataclasses.replace(cfg, mesh=MeshCfg(dp=2, tp=2, fsdp=True))
    cfg_f.validate()
    _, h_rep = _run_tp(cfg, steps=3)
    state_f, h_f = _run_tp(cfg_f, steps=3)
    for mr, mf in zip(h_rep, h_f):
        for k in ("d_loss", "w_dist", "gp", "gp_grad_norm", "g_loss"):
            np.testing.assert_allclose(mf[k], mr[k], rtol=1e-6, atol=1e-7,
                                       err_msg=k)
    sharded = [x for x in jax.tree.leaves(state_f.opt_d)
               if fsdp_shardable(x, 2)]
    assert sharded, "expected at least one sharded optimizer leaf"
    for x in sharded:
        assert x.sharding.spec[0] == "data", x.sharding
