"""Model-level context parallelism: the WaveGAN critic over a time-sharded
clip (SURVEY §5 long-context; [B:11] 4 s 44.1 kHz and beyond).

`cp_discriminator_forward` re-expresses WaveGANDiscriminator's forward with
the clip's TIME axis sharded over the 'cp' mesh axis: every conv layer is a
halo-exchange conv (one ppermute per side), phase shuffle uses the
reflect-exact CP variant, and the dense head contracts each shard's slice of
the flattened features against its slice of the head weights with ONE final
psum. Numerically identical to the unsharded module (pinned by
tests/parallel/test_cp_model.py), so a clip too long for one chip's HBM runs
across the cp axis with O(kernel) communication per layer.

Call INSIDE shard_map: x_local [B, T_loc, 1], params replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from audiogan_tpu.config import Config
from audiogan_tpu.parallel.halo import cp_conv1d, cp_phase_shuffle


def cp_discriminator_forward(
    params,
    x_local: jnp.ndarray,
    cfg: Config,
    axis: str = "cp",
    shuffle_key: jax.Array | None = None,
    labels: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Time-sharded critic score [B] (== WaveGANDiscriminator.apply)."""
    m = cfg.model
    p = params["params"]
    n_layers = len(m.strides)
    idx = lax.axis_index(axis)
    n_cp = lax.axis_size(axis)

    h = x_local
    for i, s in enumerate(m.strides):
        w = p[f"conv_{i}_kernel"]
        b = p[f"conv_{i}_bias"]
        h = cp_conv1d(h, w, stride=s, axis=axis) + b
        h = jax.nn.leaky_relu(h, 0.2)
        if shuffle_key is not None and m.phase_shuffle and i < n_layers - 1:
            k = jax.random.fold_in(shuffle_key, i)
            h = cp_phase_shuffle(h, k, m.phase_shuffle, axis)

    # dense head over the GLOBAL flattened features: shard i holds rows
    # [i*T_loc, (i+1)*T_loc) of the [T_out, C] feature map, which is a
    # contiguous block of the row-major flattened vector -> slice the head
    # weights the same way, contract locally, one psum.
    bsz, t_loc, c = h.shape
    w_head = p["head"]["kernel"]          # [T_out_global * C, 1]
    b_head = p["head"]["bias"]
    w_rows = w_head.reshape(n_cp * t_loc, c, -1)
    w_local = lax.dynamic_slice_in_dim(w_rows, idx * t_loc, t_loc, axis=0)
    score = jnp.einsum("btc,tco->bo", h, w_local)[:, 0]
    score = lax.psum(score, axis) + b_head[0]

    if cfg.data.num_classes:
        assert labels is not None
        emb = p["proj_embed"]["embedding"][labels]       # [B, C]
        pooled = lax.psum(jnp.sum(h, axis=1), axis) / (n_cp * t_loc)
        score = score + jnp.sum(pooled * emb, axis=-1)
    return score


def cp_generator_forward(
    params,
    z: jnp.ndarray,
    cfg: Config,
    axis: str = "cp",
    labels: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Time-sharded WaveGAN generator: returns THIS shard's waveform slice
    [B, clip_len/cp, 1] (== the matching slice of the unsharded module's
    output; pinned by tests/parallel/test_cp_model.py).

    The dense projection is tiny and replicated; each shard slices its rows
    of the [B, base_len, c0] seed and every transposed conv runs as a
    halo-exchange cp_conv_transpose1d, so activations never materialize the
    full clip on one chip — the mechanism that scales [B:11] clips past a
    single chip's HBM. Requires base_len % cp == 0.
    """
    m = cfg.model
    p = params["params"]
    idx = lax.axis_index(axis)
    n_cp = lax.axis_size(axis)
    n_layers = len(m.strides)

    h = z
    if cfg.data.num_classes:
        assert labels is not None
        emb = p["label_embed"]["embedding"][labels]
        h = jnp.concatenate([h, emb], axis=-1)
    h = h @ p["project"]["kernel"] + p["project"]["bias"]
    total_stride = 1
    for s in m.strides:
        total_stride *= s
    base_len = cfg.data.clip_len // total_stride
    assert base_len % n_cp == 0, "base_len must divide over cp"
    c0 = h.shape[-1] // base_len
    h = jax.nn.relu(h.reshape(h.shape[0], base_len, c0))
    h = lax.dynamic_slice_in_dim(h, idx * (base_len // n_cp),
                                 base_len // n_cp, axis=1)

    from audiogan_tpu.parallel.halo import cp_conv_transpose1d
    for i, s in enumerate(m.strides):
        w = p[f"convt_{i}_kernel"]
        b = p[f"convt_{i}_bias"]
        h = cp_conv_transpose1d(h, w, stride=s, axis=axis) + b
        h = jax.nn.relu(h) if i < n_layers - 1 else jnp.tanh(h)
    return h
