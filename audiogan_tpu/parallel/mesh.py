"""Device mesh + sharding rules (SURVEY §2.3/§2.4; [B:5,11]).

Mesh axes: ('data', 'cp'). Data parallelism shards the batch axis; the
gradient all-reduce is emitted by XLA's SPMD partitioner as a `psum` over
ICI when the jit'd train step consumes batch-sharded inputs with replicated
params — the TPU-native replacement for the reference's (absent) NCCL path.
'cp' (context/time parallelism) shards the clip time axis for long-clip
configs; its halo-exchange ops live in audiogan_tpu.parallel.halo.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiogan_tpu.config import Config


def make_mesh(cfg: Config, devices: list | None = None) -> Mesh:
    """Build the ('data', 'cp') mesh from cfg.mesh; uses the first dp*cp
    devices. dp/cp of 1 are kept as size-1 axes so shardings are uniform.
    tp>1 appends a 'tp' axis (('data','cp','tp'), cp forced to 1 by
    config.validate) for the channel-parallel critic (train/tp_step.py)."""
    dp, cp, tp = cfg.mesh.dp, cfg.mesh.cp, cfg.mesh.tp
    devices = devices if devices is not None else jax.devices()
    need = dp * cp * tp
    if len(devices) < need:
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    if tp > 1:
        dev = np.asarray(devices[:need]).reshape(dp, cp, tp)
        return Mesh(dev, ("data", "cp", "tp"))
    dev = np.asarray(devices[:need]).reshape(dp, cp)
    return Mesh(dev, ("data", "cp"))


def data_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the batch dimension is sharded over: ('data',), plus the
    outer 'dcn' axis on a multi-host hybrid mesh (parallel.multihost) —
    DP is the only strategy that rides DCN (SURVEY §2.4). The single
    source of truth for the shard_map step builders (cp_step/tp_step),
    whose replica folding/averaging must match these axes."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for raw batches [n_views, B, T]: shard B over 'data'."""
    return NamedSharding(mesh, P(None, data_axes(mesh), None))


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, data_axes(mesh)))


def index_chunk_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for resident index/label blocks [chunk, n_views, B]
    (data.index_chunk): B over 'data', chunk axis replicated."""
    return NamedSharding(mesh, P(None, None, data_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_shardable(x: Any, dp: int) -> bool:
    """Leading-axis divisibility rule for ZeRO-1 optimizer-state sharding.
    The single source of truth shared by state_shardings (annotation path),
    the cp-step shard_map in/out specs, and its in-body sharded update
    (train/cp_step.py) — the three MUST agree per leaf."""
    return x.ndim >= 1 and x.shape[0] >= dp and x.shape[0] % dp == 0


def zero1_update(opt, grads, opt_state, params, fsdp: bool, dp: int):
    """Optimizer update, optionally with ZeRO-1 optimizer-state sharding
    inside a shard_map body (SURVEY §2.3 FSDP row composed with CP/TP;
    arXiv:2004.13336 applied manually because annotation-based sharding
    cannot reach inside shard_map).

    grads and params are full/replicated here (the vma transpose already
    all-reduced the grads); with fsdp on, each fsdp_shardable optimizer leaf
    arrives as this device's 1/dp leading-axis shard (in_specs P('data')).
    The device updates only its slice of Adam state + params, then the full
    update tensor is reassembled with a masked psum over 'data' — an
    all-gather that also clears the device-varying type so the updated
    params stay replicated. Bit-equivalent to the replicated update
    (tests/parallel/test_cp_step.py::test_cp_fsdp_matches_replicated).
    """
    import jax.numpy as jnp
    from jax import lax

    if not fsdp:
        return opt.update(grads, opt_state, params)
    idx = lax.axis_index("data")

    def slc(x):
        if fsdp_shardable(x, dp):
            blk = x.shape[0] // dp
            return lax.dynamic_slice_in_dim(x, idx * blk, blk, axis=0)
        return x

    u_loc, new_opt = opt.update(jax.tree.map(slc, grads), opt_state,
                                jax.tree.map(slc, params))

    def gather(u, p):
        if not fsdp_shardable(p, dp):
            return u
        buf = jnp.zeros(p.shape, u.dtype)
        buf = lax.dynamic_update_slice_in_dim(buf, u, idx * u.shape[0],
                                              axis=0)
        return lax.psum(buf, "data")

    return jax.tree.map(gather, u_loc, params), new_opt


def state_shardings(mesh: Mesh, state: Any, fsdp: bool = False) -> Any:
    """Sharding map for the TrainState.

    Default: replicate everything (params are small; DP-only).
    fsdp=True (SURVEY §2.3, arXiv:2004.13336): shard each OPTIMIZER-state
    leaf's leading axis over 'data' when divisible — XLA's SPMD partitioner
    then computes the Adam update sharded and inserts the all-gather of the
    updated params automatically (ZeRO-1 by annotation, no manual
    collectives). Params and step/key stay replicated.
    """
    rep = replicated_sharding(mesh)
    if not fsdp:
        return jax.tree.map(lambda _: rep, state)
    dp = mesh.shape["data"]

    def opt_leaf(x):
        if fsdp_shardable(x, dp):
            return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return rep

    return state.replace(
        step=rep, base_key=rep,
        params_g=jax.tree.map(lambda _: rep, state.params_g),
        params_d=jax.tree.map(lambda _: rep, state.params_d),
        opt_g=jax.tree.map(opt_leaf, state.opt_g),
        opt_d=jax.tree.map(opt_leaf, state.opt_d),
    )
