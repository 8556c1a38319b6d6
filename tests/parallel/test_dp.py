"""Data-parallel training over the 8-device CPU farm (SURVEY §4.5):
both the auto-SPMD path (jit + sharded inputs) and the explicit
shard_map + pmean path must run, be deterministic, and keep params
replicated-identical across devices."""

import dataclasses
import functools

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiogan_tpu.config import MeshCfg
from audiogan_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                        make_mesh, state_shardings)
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step

from helpers_train import raw_batch, tiny_config

DP = 8


def _cfg():
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        mesh=MeshCfg(dp=DP, cp=1),
        train=dataclasses.replace(cfg.train, batch_size=2 * DP),
    )


def test_auto_spmd_dp():
    cfg = _cfg()
    mesh = make_mesh(cfg)
    state = create_train_state(cfg)
    state = jax.device_put(state, state_shardings(mesh, state))
    step = jax.jit(build_train_step(cfg))
    for s in range(2):
        clips, labels = raw_batch(cfg, seed=100 + s)
        clips = jax.device_put(clips, batch_sharding(mesh))
        labels = jax.device_put(labels, label_sharding(mesh))
        state, metrics = step(state, clips, labels)
    m = jax.device_get(metrics)
    assert all(np.isfinite(v) for v in m.values())
    assert int(state.step) == 2


def test_shard_map_dp_runs_and_is_deterministic():
    cfg = _cfg()
    mesh = make_mesh(cfg)
    body = build_train_step(cfg, axis_name="data")

    state_specs = jax.tree.map(lambda _: P(), create_train_state(cfg))
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(state_specs, P(None, "data", None), P(None, "data")),
        out_specs=(state_specs, P()),
        check_vma=True)
    step = jax.jit(fn)

    def run():
        state = create_train_state(cfg)
        for s in range(2):
            clips, labels = raw_batch(cfg, seed=100 + s)
            state, metrics = step(state, clips, labels)
        return jax.device_get(metrics), jax.device_get(state)

    m1, s1 = run()
    m2, s2 = run()
    assert all(np.isfinite(v) for v in m1.values())
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k], err_msg=k)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shard_map_grads_equal_manual_replica_mean():
    """DP grad-semantics oracle, computed by hand on ONE device.

    The step bodies rely on a specific vma-checked shard_map AD fact: the
    grad of a shard-varying loss w.r.t. REPLICATED params arrives already
    psum'd over the axis (the transpose auto-inserts the all-reduce), so
    the body divides by the axis size to get the replica mean
    (train/step.py _replica_mean). This test pins that contract with the
    same structure the step uses — per-replica data via axis_index-folded
    keys, grad inside shard_map, _replica_mean — against grads computed
    replica-by-replica on one device and averaged. A silent change in
    shard_map's grad semantics (the bug class Adam's scale invariance
    masks) fails this test.
    """
    import jax.numpy as jnp
    from jax import lax

    from audiogan_tpu.train.step import _replica_mean

    cfg = _cfg()
    mesh = make_mesh(cfg)
    b_loc = cfg.train.batch_size // DP
    w0 = jax.random.normal(jax.random.key(3), (16, 16))
    base = jax.random.key(11)

    def replica_batch(i):
        return jax.random.normal(jax.random.fold_in(base, i), (b_loc, 16))

    def loss(w, x):
        return jnp.mean(jnp.tanh(x @ w) ** 2)

    def sharded_grads(w):
        i = lax.axis_index("data")
        g = jax.grad(loss)(w, replica_batch(i))
        return _replica_mean(g, "data")

    got = jax.jit(shard_map(sharded_grads, mesh=mesh, in_specs=P(),
                            out_specs=P(), check_vma=True))(w0)

    want = np.mean(np.stack(
        [np.asarray(jax.grad(loss)(w0, replica_batch(i)))
         for i in range(DP)]), axis=0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_shard_map_step_params_stay_replicated():
    """Full shard_map'd step output params must be bit-identical across
    devices (replica invariance of the replicated state)."""
    cfg = _cfg()
    mesh = make_mesh(cfg)
    body = build_train_step(cfg, axis_name="data")
    state_specs = jax.tree.map(lambda _: P(), create_train_state(cfg))
    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(state_specs, P(None, "data", None), P(None, "data")),
        out_specs=(state_specs, P()),
        check_vma=True))

    state0 = create_train_state(cfg)
    clips, labels = raw_batch(cfg, seed=7)
    state_dp, _ = fn(state0, clips, labels)

    leaf = jax.tree.leaves(state_dp.params_g)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


def test_fsdp_sharded_optimizer_matches_replicated():
    """ZeRO-1 by sharding annotation (arXiv:2004.13336): sharding the
    optimizer state over 'data' must not change the math."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, mesh=dataclasses.replace(cfg.mesh,
                                                            fsdp=True))
    mesh = make_mesh(cfg)

    def run(fsdp):
        state = create_train_state(cfg)
        state = jax.device_put(state, state_shardings(mesh, state, fsdp))
        step = jax.jit(build_train_step(cfg))
        for s in range(2):
            clips, labels = raw_batch(cfg, seed=100 + s)
            clips = jax.device_put(clips, batch_sharding(mesh))
            labels = jax.device_put(labels, label_sharding(mesh))
            state, metrics = step(state, clips, labels)
        return jax.device_get(metrics), state

    m_rep, _ = run(False)
    m_fsdp, state_fsdp = run(True)
    for k in m_rep:
        np.testing.assert_allclose(m_fsdp[k], m_rep[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    # optimizer state leaves actually sharded over 'data'
    shardings = [x.sharding for x in jax.tree.leaves(state_fsdp.opt_d)
                 if hasattr(x, "sharding") and x.ndim >= 1
                 and x.shape[0] % DP == 0 and x.shape[0] >= DP]
    assert any(isinstance(s, NamedSharding) and "data" in str(s.spec)
               for s in shardings), shardings


def test_auto_spmd_dp_equals_single_device():
    """SURVEY §4.5: DP over 8 devices == the identical step on 1 device for
    the same global batch (auto-SPMD partitions the same program, so the
    math must match to reduction-order tolerance)."""
    cfg = _cfg()
    step = jax.jit(build_train_step(cfg))

    def run(shard):
        state = create_train_state(cfg)
        if shard:
            mesh = make_mesh(cfg)
            state = jax.device_put(state, state_shardings(mesh, state))
        hist = []
        for s in range(2):
            clips, labels = raw_batch(cfg, seed=100 + s)
            if shard:
                clips = jax.device_put(clips, batch_sharding(mesh))
                labels = jax.device_put(labels, label_sharding(mesh))
            state, metrics = step(state, clips, labels)
            hist.append(jax.device_get(metrics))
        return hist

    h1 = run(shard=False)
    h8 = run(shard=True)
    for m1, m8 in zip(h1, h8):
        for k in m1:
            np.testing.assert_allclose(m8[k], m1[k], rtol=2e-4, atol=1e-5,
                                       err_msg=k)
