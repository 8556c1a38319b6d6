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
    """Time-sharded critic score [B] (== the unsharded discriminator built
    by models.factory: WaveGANDiscriminator, or DualDiscriminator when
    cfg.model.use_stft_critic)."""
    p = params["params"]
    if cfg.model.use_stft_critic:
        wave = _wave_critic_score(p["wave_critic"], x_local, cfg, axis,
                                  shuffle_key, labels)
        stft = _stft_critic_score(p["stft_critic"], x_local, cfg, axis,
                                  labels)
        return wave + stft
    return _wave_critic_score(p, x_local, cfg, axis, shuffle_key, labels)


def _wave_critic_score(
    p,
    x_local: jnp.ndarray,
    cfg: Config,
    axis: str,
    shuffle_key: jax.Array | None = None,
    labels: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Time-sharded WaveGANDiscriminator score from its param subtree."""
    m = cfg.model
    n_layers = len(m.strides)
    idx = lax.axis_index(axis)
    n_cp = lax.axis_size(axis)
    # honor the configured kernel tier (auto/pallas route the local VALID
    # convs through the same primitives as the unsharded critic)
    impl = cfg.train.kernels_d or cfg.train.kernels

    h = x_local
    for i, s in enumerate(m.strides):
        w = p[f"conv_{i}_kernel"]
        b = p[f"conv_{i}_bias"]
        h = cp_conv1d(h, w, stride=s, axis=axis, impl=impl) + b
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


def _stft_critic_score(
    p,
    x_local: jnp.ndarray,
    cfg: Config,
    axis: str,
    labels: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Time-sharded STFTCritic score from its param subtree.

    Per SURVEY §5's STFT clause: with hop-aligned shard boundaries, each
    shard's frames are local given one right halo of (win - hop) samples —
    and the zeros a non-cyclic ppermute delivers at the global edge are
    exactly the critic's pad_tail convention (models/stft_critic.py), so
    sharded == unsharded. The 2D conv stack shards only the frame axis
    (cp_conv2d_frames halos); the head psums once.
    """
    from audiogan_tpu.ops.stft import stft_magnitude
    from audiogan_tpu.parallel.halo import cp_conv2d_frames, gather_halo

    n_fft, hop, win = cfg.model.stft_resolutions[0]
    idx = lax.axis_index(axis)
    n_cp = lax.axis_size(axis)
    t_loc = x_local.shape[1]
    assert t_loc % hop == 0, "shard boundaries must be hop-aligned"

    x_ext = gather_halo(x_local, 0, win - hop, axis)
    mag = stft_magnitude(x_ext[..., 0], n_fft, hop, win)  # [B, T_loc/hop, F]
    h = jnp.log1p(mag)[..., None]

    n_layers = 0
    while f"conv2d_{n_layers}" in p:
        n_layers += 1
    for i in range(n_layers):
        w = p[f"conv2d_{i}"]["kernel"]
        b = p[f"conv2d_{i}"]["bias"]
        h = cp_conv2d_frames(h, w, (2, 2), axis) + b
        h = jax.nn.leaky_relu(h, 0.2)

    bsz, f_loc, bins, c = h.shape
    w_head = p["head"]["kernel"]          # [F_glob * bins * c, 1]
    b_head = p["head"]["bias"]
    w_rows = w_head.reshape(n_cp * f_loc, bins * c, -1)
    w_local = lax.dynamic_slice_in_dim(w_rows, idx * f_loc, f_loc, axis=0)
    score = jnp.einsum("btc,tco->bo", h.reshape(bsz, f_loc, bins * c),
                       w_local)[:, 0]
    score = lax.psum(score, axis) + b_head[0]

    if cfg.data.num_classes:
        assert labels is not None
        emb = p["proj_embed"]["embedding"][labels]
        pooled = lax.psum(jnp.sum(h, axis=(1, 2)), axis) / (
            n_cp * f_loc * bins)
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
    impl = cfg.train.kernels_g or cfg.train.kernels
    for i, s in enumerate(m.strides):
        w = p[f"convt_{i}_kernel"]
        b = p[f"convt_{i}_bias"]
        h = cp_conv_transpose1d(h, w, stride=s, axis=axis, impl=impl) + b
        h = jax.nn.relu(h) if i < n_layers - 1 else jnp.tanh(h)
    return h


def cp_gru_generator_forward(
    params,
    z: jnp.ndarray,
    cfg: Config,
    axis: str = "cp",
    labels: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Time-sharded GRU generator: returns THIS shard's waveform slice
    [B, clip_len/cp, 1] (== the matching slice of models.gru.GRUGenerator;
    pinned by tests/parallel/test_cp_gru.py).

    The frame-level recurrence stays EXACT across shards: the
    (hidden, prev_feat) carry — including the autoregressive frame
    conditioning — crosses shard boundaries through cp_chunked_scan's
    ppermute handoff (SURVEY §2.3 "GRU handled by frame-level chunked scan
    with state handoff via ppermute"), while the conv-transpose upsample
    stack — where the FLOPs and activation memory are — runs fully
    time-sharded with halo exchange. Requires n_frames % cp == 0.
    """
    from audiogan_tpu.models.gru import factorize_stride
    from audiogan_tpu.ops.gru import gru_cell
    from audiogan_tpu.parallel.halo import cp_chunked_scan, cp_conv_transpose1d

    m = cfg.model
    p = params["params"]
    n_cp = lax.axis_size(axis)
    n_frames = cfg.data.clip_len // m.gru_frame_size
    assert n_frames % n_cp == 0, "n_frames must divide over cp"
    f_loc = n_frames // n_cp

    cond = z
    if cfg.data.num_classes:
        assert labels is not None
        emb = p["label_embed"]["embedding"][labels]
        cond = jnp.concatenate([cond, emb], axis=-1)
    h0 = jnp.tanh(cond @ p["init_state"]["kernel"]
                  + p["init_state"]["bias"])
    cond_proj = cond @ p["cond_proj"]["kernel"] + p["cond_proj"]["bias"]
    w_i, w_h = p["gru_w_i"], p["gru_w_h"]
    b_i, b_h = p["gru_b_i"], p["gru_b_h"]
    w_ar, w_out, b_out = p["ar_proj"], p["frame_out"], p["frame_out_bias"]

    def step(carry, _):
        h, prev = carry
        x = jnp.concatenate([prev @ w_ar, cond_proj], axis=-1)
        h = gru_cell(x, h, w_i, w_h, b_i, b_h)
        feat = jnp.tanh(h @ w_out + b_out)
        return (h, feat), feat

    # zeros_like keeps cond_proj's vma type: under a ('data','cp') mesh the
    # carry must be uniformly data-varying or lax.scan rejects the carry
    f0 = jnp.zeros_like(cond_proj)
    feats = cp_chunked_scan(step, (h0, f0), f_loc, axis)  # [F_loc, B, F]
    h = jnp.transpose(feats, (1, 0, 2))

    # (the GRU cell itself stays on the XLA tier here: cp pipelines the
    # recurrence via cp_chunked_scan's ppermute carry handoff, which the
    # persistent fused-scan kernel cannot cross)
    strides = factorize_stride(m.gru_frame_size)
    impl = cfg.train.kernels_g or cfg.train.kernels
    for i, s in enumerate(strides):
        w = p[f"up_{i}_kernel"]
        bb = p[f"up_{i}_bias"]
        h = cp_conv_transpose1d(h, w, stride=s, axis=axis, impl=impl) + bb
        h = jax.nn.relu(h) if i < len(strides) - 1 else jnp.tanh(h)
    return h


def cp_batch_spectral_matching_loss(
    fake_loc: jnp.ndarray,
    real_loc: jnp.ndarray,
    resolutions,
    axis: str = "cp",
) -> jnp.ndarray:
    """Time-sharded equivalent of losses.stft_loss.batch_spectral_matching_
    loss (the dual_stft G term): each shard frames its hop-aligned slice
    with one right halo of (win - hop) samples — exactly the cp STFT-critic
    recipe — computes the local rows of the batch-mean magnitude spectra,
    and the spectral-convergence / log-magnitude reductions psum their
    frame sums over cp. Frames past the global (T - win)//hop + 1 count
    (which read the zeros a non-cyclic ppermute delivers at the clip edge)
    are masked out, so the result equals the unsharded loss exactly
    (tests/parallel/test_cp_step.py::test_cp_step_stft_loss...).

    fake_loc/real_loc: [B, T_loc] local time slices (same batch on every
    cp shard, like the rest of the cp step).
    """
    from audiogan_tpu.ops.stft import stft_magnitude
    from audiogan_tpu.parallel.halo import gather_halo

    idx = lax.axis_index(axis)
    n_cp = lax.axis_size(axis)
    t_loc = fake_loc.shape[1]
    total = 0.0
    for n_fft, hop, win in resolutions:
        assert t_loc % hop == 0, (
            f"cp shard length {t_loc} must be divisible by hop {hop} "
            f"(config.validate enforces this for stft_loss under cp)")
        assert win - hop <= t_loc, "halo wider than one shard"
        f_loc = t_loc // hop
        n_valid = (n_cp * t_loc - win) // hop + 1
        gidx = idx * f_loc + jnp.arange(f_loc)
        mask = (gidx < n_valid).astype(jnp.float32)[:, None]   # [f_loc, 1]

        def _mag(x):
            x_ext = gather_halo(x, 0, win - hop, axis)
            m = stft_magnitude(x_ext, n_fft, hop, win)         # [B,f_loc,F]
            return jnp.mean(m, axis=0)                         # [f_loc, F]

        fm, rm = _mag(fake_loc), _mag(real_loc)
        # spectral convergence: global Frobenius norms over (frames, bins)
        num = jnp.sqrt(lax.psum(jnp.sum(jnp.square((rm - fm)) * mask),
                                axis))
        den = jnp.sqrt(lax.psum(jnp.sum(jnp.square(rm) * mask), axis))
        sc = num / (den + 1e-8)
        # log-magnitude L1: global mean over valid (frames, bins)
        la = lax.psum(jnp.sum(jnp.abs(jnp.log(fm + 1e-7)
                                      - jnp.log(rm + 1e-7)) * mask), axis)
        lm = la / (n_valid * fm.shape[-1])
        total = total + sc + lm
    return total / len(resolutions)
