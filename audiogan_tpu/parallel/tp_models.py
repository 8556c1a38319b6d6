"""Model-level tensor (channel) parallelism: the WaveGAN critic with its
channel axis computed across the 'tp' mesh axis (SURVEY §2.3 TP row).

`tp_discriminator_forward` re-expresses WaveGANDiscriminator's forward as
the Megatron-style column->row conv pairing (parallel/tp.py): odd layers
slice the KERNEL's output channels (no communication, activations become
channel-sharded), even layers slice input channels and psum the partial
outputs back to full — one all-reduce per pair. The dense head and the
projection-discriminator term contract each shard's channel slice against
the matching slice of the replicated weights with one final psum.

Params stay REPLICATED (the per-shard slices are carved with
lax.dynamic_slice at trace time): this is compute/FLOP parallelism for
wide critics, complementary to DP (batch) and CP (time). Numerically
identical to the unsharded module — pinned by tests/parallel/test_tp_model.py
for values AND WGAN-GP-style gradients.

Call INSIDE shard_map over the 'tp' axis: x [B, T, 1] replicated (P()),
params replicated, output replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from audiogan_tpu.config import Config
from audiogan_tpu.ops.conv import conv1d
from audiogan_tpu.ops.phase_shuffle import phase_shuffle


def _slice_dim(a: jnp.ndarray, dim: int, idx, n: int) -> jnp.ndarray:
    # dynamic_slice CLAMPS out-of-range starts, so a non-divisible channel
    # dim would silently compute wrong scores instead of erroring (ADVICE r2)
    assert a.shape[dim] % n == 0, \
        f"tp={n} must divide dim {dim} of shape {a.shape}"
    blk = a.shape[dim] // n
    return lax.dynamic_slice_in_dim(a, idx * blk, blk, axis=dim)


def tp_discriminator_forward(
    params,
    x: jnp.ndarray,
    cfg: Config,
    axis: str = "tp",
    shuffle_key: jax.Array | None = None,
    labels: jnp.ndarray | None = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Channel-parallel critic score [B] (== the unsharded
    WaveGANDiscriminator; column/row layer pairing over `axis`)."""
    m = cfg.model
    assert not m.use_stft_critic, "TP critic covers the wave critic"
    p = params["params"]
    n_layers = len(m.strides)
    idx = lax.axis_index(axis)
    n_tp = lax.axis_size(axis)

    h = x
    sharded = False  # is h's channel axis a 1/n_tp slice?
    for i, s in enumerate(m.strides):
        w = p[f"conv_{i}_kernel"]           # [K, Cin, Cout]
        b = p[f"conv_{i}_bias"]
        if not sharded:
            # column-parallel: slice output channels, no communication
            w_loc = _slice_dim(w, 2, idx, n_tp)
            b_loc = _slice_dim(b, 0, idx, n_tp)
            h = conv1d(h, w_loc, stride=s, padding="SAME", impl=impl) + b_loc
            sharded = True
        else:
            # row-parallel: slice input channels, ONE psum restores full
            w_loc = _slice_dim(w, 1, idx, n_tp)
            part = conv1d(h, w_loc, stride=s, padding="SAME", impl=impl)
            h = lax.psum(part, axis) + b
            sharded = False
        h = jax.nn.leaky_relu(h, 0.2)
        if shuffle_key is not None and m.phase_shuffle and i < n_layers - 1:
            # same key on every shard => identical time shifts, so the
            # channel slicing commutes with the shuffle
            h = phase_shuffle(h, jax.random.fold_in(shuffle_key, i),
                              m.phase_shuffle)

    bsz, t_out, c = h.shape
    w_head = p["head"]["kernel"]            # [T_out * C_glob, 1]
    b_head = p["head"]["bias"]
    if sharded:
        c_glob = c * n_tp
        w_rows = w_head.reshape(t_out, c_glob, -1)
        w_loc = _slice_dim(w_rows, 1, idx, n_tp)
        score = lax.psum(jnp.einsum("btc,tco->bo", h, w_loc)[:, 0], axis)
    else:
        score = (h.reshape(bsz, -1) @ w_head)[:, 0]
    score = score + b_head[0]

    if cfg.data.num_classes:
        assert labels is not None
        emb = p["proj_embed"]["embedding"][labels]      # [B, C_glob]
        pooled = h.mean(axis=1)
        if sharded:
            emb_loc = _slice_dim(emb, 1, idx, n_tp)
            score = score + lax.psum(
                jnp.sum(pooled * emb_loc, axis=-1), axis)
        else:
            score = score + jnp.sum(pooled * emb, axis=-1)
    return score
