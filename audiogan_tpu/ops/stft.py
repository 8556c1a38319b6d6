"""Framed STFT magnitude on device (SURVEY C11/C12 substrate).

Reference equivalent: torch.stft -> cuFFT. TPU-native: strided framing via a
reshape-free gather-as-slice (conv-style frame extraction with
`lax.conv_general_dilated_patches` is heavier than needed; we use a strided
`jax.vmap` of dynamic slices lowered to one XLA `gather`... in practice the
simplest XLA-friendly framing is `jnp.reshape` after an as_strided-like
slice stack, which XLA turns into a single copy), Hann window, and
`jnp.fft.rfft` (XLA FFT on TPU). Everything static-shaped.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int, win_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rfft basis, rows truncated to win_len: [win_len, bins]."""
    n = np.arange(win_len)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _hann(win_len: int) -> np.ndarray:
    # periodic Hann, matches torch.hann_window(win_len, periodic=True)
    n = np.arange(win_len)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_len)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _windowed_basis(n_fft: int, win_len: int) -> tuple[np.ndarray, np.ndarray]:
    """DFT basis with the Hann window folded in: frames @ (h∘C) ==
    (frames*h) @ C by associativity, so the per-frame window multiply —
    a [.., n_frames, win_len] elementwise pass XLA must stage as a matmul
    operand — becomes a trace-time constant transform (VERDICT r3 #5)."""
    cos_b, sin_b = _dft_basis(n_fft, win_len)
    h = _hann(win_len)[:, None]
    return (cos_b * h).astype(np.float32), (sin_b * h).astype(np.float32)


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, frame_len] with static n_frames.

    Frames start at multiples of hop; the tail that doesn't fill a final
    frame is dropped (center=False convention).
    """
    t = x.shape[-1]
    n_frames = (t - frame_len) // hop + 1
    if n_frames <= 0:
        raise ValueError(f"signal too short: T={t} < frame_len={frame_len}")
    # Build [n_frames, frame_len] gather indices once at trace time.
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :])
    return x[..., idx]


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_len: int | None = None,
    eps: float = 1e-7,
    pad_tail: bool = False,
) -> jnp.ndarray:
    """|STFT| of [..., T] -> [..., n_frames, n_fft//2 + 1], float32.

    Hann window, center=False, zero-padded to n_fft when win_len < n_fft.
    eps floors the magnitude so sqrt's gradient is finite at 0 — this op sits
    inside losses/critics on the WGAN-GP double-backprop path.

    pad_tail=True appends (win_len - hop) zeros so a frame starts at EVERY
    hop: n_frames = T/hop exactly (requires T % hop == 0). This is the
    shard-friendly grid the STFT critic uses — the frame axis is uniform
    over context-parallel time shards, and the zeros a tail frame reads are
    exactly what a non-cyclic halo exchange delivers at the global edge
    (SURVEY §5 STFT clause; SPEC.md). Default False keeps the
    tail-dropping convention of the multi-res loss.
    """
    if win_len is None:
        win_len = n_fft
    if pad_tail:
        if x.shape[-1] % hop:
            raise ValueError("pad_tail needs T divisible by hop")
        pad = [(0, 0)] * (x.ndim - 1) + [(0, win_len - hop)]
        x = jnp.pad(x, pad)
    frames = frame_signal(x, win_len, hop)
    # rfft as two real MXU matmuls against a precomputed DFT basis, instead
    # of XLA's FFT: (a) for n_fft <= ~1k the 128x128 systolic array runs the
    # dense DFT faster than TPU FFT lowering; (b) it is transparent to
    # every jax transform — jnp.fft.rfft's abstract eval drops shard_map
    # vma annotations under grad-of-grad (the GP double-backprop path),
    # which a plain dot never can. Basis rows stop at win_len: the
    # zero-padding to n_fft contributes nothing. The Hann window is folded
    # into the basis (one constant, zero runtime ops — see _windowed_basis).
    cos_b, sin_b = _windowed_basis(n_fft, win_len)
    frames = frames.astype(jnp.float32)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = jnp.square(re) + jnp.square(im)
    return jnp.sqrt(power + eps)
