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
    """('dcn', 'data', 'cp') mesh: dcn = slices (DP-only over DCN), the
    inner axes exactly as in parallel.mesh over each slice's ICI."""
    import numpy as np

    n_slices = max(jax.process_count(), 1)
    if n_slices > 1:
        from jax.experimental import mesh_utils
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(cfg.mesh.dp, cfg.mesh.cp),
            dcn_mesh_shape=(n_slices, 1),
            devices=jax.devices())
    else:
        # single process: degenerate dcn axis of size 1 (no DCN hardware
        # attributes to consult)
        need = cfg.mesh.dp * cfg.mesh.cp
        devices = np.asarray(jax.devices()[:need])
    return Mesh(devices.reshape(n_slices, cfg.mesh.dp, cfg.mesh.cp),
                ("dcn", "data", "cp"))
