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
def _hann(win_len: int) -> np.ndarray:
    # periodic Hann, matches torch.hann_window(win_len, periodic=True)
    n = np.arange(win_len)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_len)).astype(np.float32)


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
) -> jnp.ndarray:
    """|STFT| of [..., T] -> [..., n_frames, n_fft//2 + 1], float32.

    Hann window, center=False, zero-padded to n_fft when win_len < n_fft.
    eps floors the magnitude so sqrt's gradient is finite at 0 — this op sits
    inside losses/critics on the WGAN-GP double-backprop path.
    """
    if win_len is None:
        win_len = n_fft
    frames = frame_signal(x, win_len, hop) * jnp.asarray(_hann(win_len))
    if win_len < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win_len)]
        frames = jnp.pad(frames, pad)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))
    return jnp.sqrt(power + eps)
