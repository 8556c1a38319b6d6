"""Multi-host / multi-slice setup (SURVEY §2.4 DCN tier).

Single-slice training uses only ICI (parallel/mesh.py). Across slices or
hosts, the outer mesh axis rides DCN: data-parallel only over DCN (its
grad all-reduce tolerates the lower bandwidth) while CP/TP stay confined to
ICI — the axis ordering in `make_multihost_mesh` encodes exactly that.

Untestable in this environment (single chip, SURVEY [ENV]); the code path
is the standard JAX multi-controller recipe and activates only when the
cluster env (JAX_COORDINATOR_ADDRESS / TPU metadata) is present.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh

from audiogan_tpu.config import Config


def maybe_initialize_distributed() -> bool:
    """jax.distributed.initialize() iff a cluster environment is detected.

    Returns True when running multi-process. Safe to call unconditionally;
    single-process runs are untouched.
    """
    if jax.process_count() > 1:
        return True  # already initialized
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


def make_multihost_mesh(cfg: Config) -> Mesh:
    """('dcn', 'data', 'cp'[, 'tp']) mesh: dcn = slices, the inner axes
    exactly as in parallel.mesh over each slice's ICI. Only DP rides DCN —
    cp/tp shards live entirely within one slice, so their halo/psum
    collectives stay on ICI; the dcn axis carries only the grad all-reduce
    (SURVEY §2.4). cp>1 / tp>1 compose via train/cp_step.py /
    train/tp_step.py, whose shard_map bodies shard the batch over
    ('dcn','data') (tests/parallel/test_multihost.py, 2-process)."""
    import numpy as np

    inner = (cfg.mesh.dp, cfg.mesh.cp)
    axes = ("dcn", "data", "cp")
    if cfg.mesh.tp > 1:
        inner += (cfg.mesh.tp,)
        axes += ("tp",)
    need = int(np.prod(inner))
    n_slices = max(jax.process_count(), 1)
    if n_slices > 1:
        try:
            from jax.experimental import mesh_utils
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=inner,
                dcn_mesh_shape=(n_slices,) + (1,) * (len(inner) - 1),
                devices=jax.devices())
        except Exception:
            # CPU farms lack slice_index attributes: group by process,
            # which IS the DCN boundary, and take only the dp*cp*tp
            # devices each slice contributes (hosts may expose more)
            by_proc = {}
            for d in sorted(jax.devices(),
                            key=lambda d: (d.process_index, d.id)):
                by_proc.setdefault(d.process_index, []).append(d)
            for pi, grp in by_proc.items():
                if len(grp) < need:
                    raise ValueError(
                        f"process {pi} exposes {len(grp)} devices but the "
                        f"mesh needs dp*cp*tp={need} per slice")
            devs = [d for grp in by_proc.values() for d in grp[:need]]
            devices = np.asarray(devs)
    else:
        # single process: degenerate dcn axis of size 1 (no DCN hardware
        # attributes to consult)
        devices = np.asarray(jax.devices()[:need])
    return Mesh(devices.reshape((n_slices,) + inner), axes)


def make_train_mesh(cfg: Config) -> Mesh:
    """The mesh train/loop.py runs on: the plain ('data','cp') ICI mesh in
    a single process, or the ('dcn','data','cp') hybrid after
    jax.distributed initialization when a cluster environment is present.
    cfg.mesh.dp is PER-PROCESS on the hybrid mesh; global data parallelism
    is process_count * dp."""
    from audiogan_tpu.parallel.mesh import make_mesh

    if maybe_initialize_distributed():
        return make_multihost_mesh(cfg)
    return make_mesh(cfg)


def put_global_batch(arr, sharding):
    """Host batch -> global jax.Array under `sharding`.

    Multi-process: every process holds the SAME full batch (HostBatcher is
    (seed, step)-pure, so ranks agree bit-for-bit) and each device picks its
    slice via the callback — no cross-host data motion. Single-process:
    plain device_put."""
    if jax.process_count() > 1:
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])
    return jax.device_put(arr, sharding)
