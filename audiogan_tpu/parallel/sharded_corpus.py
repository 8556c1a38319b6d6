"""Data-axis-sharded device-resident corpus (VERDICT r3 #4, SURVEY §2.3 DP
row / [B:11] scale config).

The replicated device corpus (train/step.py wrap_device_corpus) caps out at
DEVICE_CORPUS_MAX_GB per chip because every replica holds ALL clips next to
the training state. This module shards the packed [N, store_len] int16 clip
array over the batch ('data', and 'dcn' on hybrid meshes) axes instead —
n_data_shards× the capacity — and gathers each step's global indices with
one explicit collective pattern that stays on ICI:

    all_gather(idx)            # ~KBs: every shard learns the global index set
    masked local take          # each shard gathers the rows IT holds, 0 elsewhere
    psum_scatter(batch axis)   # one reduce-scatter delivers each replica its
                               # own batch rows (~(dp-1)/dp x 21 MB/step at the
                               # flagship — ICI bandwidth, not the host link)

Every global index lives on exactly one shard, so the masked sum is exact —
the gathered stream is bit-identical to the replicated corpus gather and to
the host batcher (pinned by tests/train/test_sharded_corpus.py).

The clip axis is zero-padded to a multiple of the shard count; padded rows
are never addressed because HostBatcher draws indices in [0, N).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiogan_tpu.parallel.mesh import data_axes


def corpus_num_shards(mesh: Mesh) -> int:
    """Number of corpus shards = product of the batch-sharding axes."""
    return math.prod(mesh.shape[a] for a in data_axes(mesh))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Clip axis sharded over the batch axes; sample axis replicated."""
    return NamedSharding(mesh, P(data_axes(mesh), None))


def pad_clips_to_shards(clips: np.ndarray, n_shards: int) -> np.ndarray:
    """Zero-pad the clip axis to a multiple of n_shards (padded rows are
    never indexed: HostBatcher draws in [0, N))."""
    n = clips.shape[0]
    pad = (-n) % n_shards
    if pad == 0:
        return np.ascontiguousarray(clips)
    return np.concatenate(
        [clips, np.zeros((pad,) + clips.shape[1:], clips.dtype)], axis=0)


def sharded_corpus_gather(corpus_dev: jax.Array, idx: jax.Array,
                          mesh: Mesh) -> jax.Array:
    """[N_padded, L] 'data'-sharded corpus x [n_views, B] global clip ids
    ('data'-sharded on B) -> [n_views, B, L] raw batch, 'data'-sharded on B.

    Runs as a shard_map over the full mesh: corpus and output are
    replicated over any non-batch axes (cp/tp), so it composes with the
    cp/tp shard_map steps exactly like the replicated gather did.
    """
    axes = data_axes(mesh)
    n_total = corpus_dev.shape[0]
    nsh = corpus_num_shards(mesh)
    assert n_total % nsh == 0, (n_total, nsh)
    n_local = n_total // nsh

    def body(cl, idx_l):
        # linearized shard index over the batch axes (outermost first —
        # matches both the P(axes) corpus layout and the global batch order)
        r = jnp.int32(0)
        for a in axes:
            r = r * lax.axis_size(a) + lax.axis_index(a)
        # global index set (tiny): gather innermost axis first so block
        # order matches the global batch layout (outermost axis leads)
        idx_g = idx_l
        for a in reversed(axes):
            idx_g = lax.all_gather(idx_g, a, axis=1, tiled=True)
        loc = idx_g - r * n_local
        ok = (loc >= 0) & (loc < n_local)
        g = jnp.take(cl, jnp.clip(loc, 0, n_local - 1), axis=0)
        g = jnp.where(ok[..., None], g, jnp.zeros((), g.dtype))
        # reduce-scatter the masked partials: outermost axis first (inverse
        # of the gather order), leaving each replica its own B rows
        for a in axes:
            g = lax.psum_scatter(g, a, scatter_dimension=1, tiled=True)
        return g

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes, None), P(None, axes)),
        out_specs=P(None, axes, None),
        check_vma=True)(corpus_dev, idx)
