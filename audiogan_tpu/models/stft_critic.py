"""STFT-spectrogram critic + dual discriminator (SURVEY C11, [B:10]).

The STFT critic scores log-magnitude spectrograms with a strided 2D conv
stack (XLA FFT on TPU for the STFT, MXU for the convs). DualDiscriminator
sums the raw-waveform conv critic's score and the STFT critic's score —
the "dual discriminator" capability of [B:10]. Everything is built from
ops that are 2nd-order differentiable, since the WGAN-GP gradient penalty
differentiates through the full dual score.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from audiogan_tpu.models.wavegan import WaveGANDiscriminator
from audiogan_tpu.ops.stft import stft_magnitude

_KERNEL_INIT = nn.initializers.glorot_uniform()
_BIAS_INIT = nn.initializers.zeros_init()


class STFTCritic(nn.Module):
    n_fft: int = 512
    hop: int = 128
    win_len: int = 512
    model_dim: int = 32
    n_layers: int = 4
    num_classes: int = 0
    kernels: str = "xla"          # accepted for API symmetry (2D convs are XLA)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray | None = None,
                 train: bool = True) -> jnp.ndarray:
        """x [B, T, 1] -> scores [B].

        Frame grid: one frame per hop with a zero tail (pad_tail=True), so
        the frame axis is T/hop exactly — a SPEC decision (no reference
        code exists to match) chosen so the spectrogram shards cleanly over
        the context-parallel time axis (parallel.cp_models
        .cp_stft_critic_forward) while staying identical unsharded.
        """
        mag = stft_magnitude(x[..., 0], self.n_fft, self.hop, self.win_len,
                             pad_tail=True)
        h = jnp.log1p(mag)[..., None].astype(self.dtype)  # [B, frames, bins, 1]
        for i in range(self.n_layers):
            c = min(self.model_dim * 2 ** i, 512)
            h = nn.Conv(c, (5, 5), strides=(2, 2), padding="SAME",
                        kernel_init=_KERNEL_INIT, bias_init=_BIAS_INIT,
                        dtype=self.dtype, name=f"conv2d_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        feat = h.reshape(h.shape[0], -1)
        score = nn.Dense(1, kernel_init=_KERNEL_INIT, bias_init=_BIAS_INIT,
                         dtype=self.dtype, name="head")(feat)[:, 0]
        if self.num_classes:
            assert labels is not None
            pooled = h.mean(axis=(1, 2))
            emb = nn.Embed(self.num_classes, pooled.shape[-1],
                           embedding_init=_KERNEL_INIT, name="proj_embed",
                           dtype=self.dtype)(labels)
            score = score + jnp.sum(pooled * emb, axis=-1)
        return score.astype(jnp.float32)


class DualDiscriminator(nn.Module):
    """Raw-waveform conv critic + STFT critic, scores summed ([B:10])."""

    model_dim: int = 64
    kernel_size: int = 25
    strides: Sequence[int] = (4, 4, 4, 4, 4)
    phase_shuffle_rad: int = 2
    num_classes: int = 0
    embed_dim: int = 64
    max_channels: int = 1024
    stft_resolution: tuple[int, int, int] = (512, 128, 512)
    kernels: str = "xla"
    fused_shuffle_sites: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray | None = None,
                 train: bool = True) -> jnp.ndarray:
        wave_score = WaveGANDiscriminator(
            model_dim=self.model_dim, kernel_size=self.kernel_size,
            strides=self.strides, phase_shuffle_rad=self.phase_shuffle_rad,
            num_classes=self.num_classes, embed_dim=self.embed_dim,
            max_channels=self.max_channels, kernels=self.kernels,
            fused_shuffle_sites=self.fused_shuffle_sites,
            dtype=self.dtype, name="wave_critic")(x, labels, train)
        n_fft, hop, win = self.stft_resolution
        stft_score = STFTCritic(
            n_fft=n_fft, hop=hop, win_len=win,
            model_dim=max(self.model_dim // 2, 16),
            num_classes=self.num_classes, kernels=self.kernels,
            dtype=self.dtype, name="stft_critic")(x, labels, train)
        return wave_score + stft_score
