"""Config -> model construction (the A4 entry point used by train/sample)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from audiogan_tpu.config import Config
from audiogan_tpu.models.gru import GRUGenerator
from audiogan_tpu.models.stft_critic import DualDiscriminator
from audiogan_tpu.models.wavegan import WaveGANDiscriminator, WaveGANGenerator

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_generator(cfg: Config) -> nn.Module:
    m, d = cfg.model, cfg.data
    dtype = _DTYPES[cfg.train.dtype]
    kernels = cfg.train.kernels_g or cfg.train.kernels
    if m.generator == "wavegan":
        return WaveGANGenerator(
            clip_len=d.clip_len, latent_dim=m.latent_dim,
            model_dim=m.model_dim, kernel_size=m.kernel_size,
            strides=m.strides, num_classes=d.num_classes,
            embed_dim=m.embed_dim, max_channels=m.max_channels,
            kernels=kernels, dtype=dtype)
    if m.generator == "gru":
        return GRUGenerator(
            clip_len=d.clip_len, latent_dim=m.latent_dim,
            model_dim=m.model_dim, hidden=m.gru_hidden,
            frame_size=m.gru_frame_size, kernel_size=m.kernel_size,
            num_classes=d.num_classes, embed_dim=m.embed_dim,
            kernels=kernels, dtype=dtype)
    raise ValueError(f"unknown generator {m.generator!r}")


def build_discriminator(cfg: Config) -> nn.Module:
    m, d = cfg.model, cfg.data
    dtype = _DTYPES[cfg.train.dtype]
    common = dict(model_dim=m.model_dim, kernel_size=m.kernel_size,
                  strides=m.strides, phase_shuffle_rad=m.phase_shuffle,
                  num_classes=d.num_classes, embed_dim=m.embed_dim,
                  max_channels=m.max_channels,
                  fused_shuffle_sites=m.fused_shuffle_sites,
                  kernels=cfg.train.kernels_d or cfg.train.kernels,
                  dtype=dtype)
    if m.use_stft_critic:
        return DualDiscriminator(stft_resolution=m.stft_resolutions[0],
                                 **common)
    return WaveGANDiscriminator(**common)
