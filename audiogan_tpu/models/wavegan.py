"""WaveGAN-style generator and discriminator (SURVEY C7, C9, C10, C15).

Architecture follows Donahue et al. 2019 (arXiv:1802.04208), the model family
the reference implements [B:5]:

  G: z [B, Z] (-> concat class embedding [C15]) -> dense -> [B, base_len, c0]
     -> L x (conv_transpose1d(stride s_i, kernel k) + ReLU) -> tanh
     -> waveform [B, clip_len, 1], clip_len = base_len * prod(strides)

  D: waveform [B, T, 1] -> L x (conv1d(stride s_i, kernel k) + LeakyReLU(0.2)
     + phase_shuffle [C10], no normalization per WGAN-GP) -> flatten -> dense
     -> scalar score; class conditioning via projection (Miyato & Koyama
     2018) on the pooled features.

SPEC decisions pinned by tests (no reference code exists to match, SURVEY
R1): glorot_uniform kernel init, zero bias init, phase shuffle after every
conv layer except the last, LeakyReLU slope 0.2.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from audiogan_tpu.kernels.sconv import sconv1d_ba
from audiogan_tpu.ops.conv import conv1d_ba, conv_transpose1d_ba
from audiogan_tpu.ops.phase_shuffle import phase_shuffle

_KERNEL_INIT = nn.initializers.glorot_uniform()
_BIAS_INIT = nn.initializers.zeros_init()


def _gen_channels(model_dim: int, n_layers: int, max_ch: int) -> list[int]:
    """Output channels per G layer: d*2^(L-2-i) capped, final layer 1."""
    chs = [min(model_dim * 2 ** (n_layers - 2 - i), max_ch)
           for i in range(n_layers - 1)]
    return chs + [1]


def _disc_channels(model_dim: int, n_layers: int, max_ch: int) -> list[int]:
    return [min(model_dim * 2 ** i, max_ch) for i in range(n_layers)]


class WaveGANGenerator(nn.Module):
    clip_len: int = 16384
    latent_dim: int = 100
    model_dim: int = 64
    kernel_size: int = 25
    strides: Sequence[int] = (4, 4, 4, 4, 4)
    num_classes: int = 0
    embed_dim: int = 64
    max_channels: int = 1024
    kernels: str = "xla"          # conv impl: xla | pallas
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, labels: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
        """z [B, latent_dim], labels int32 [B] (if num_classes>0) -> [B, T, 1]."""
        n_layers = len(self.strides)
        total_stride = 1
        for s in self.strides:
            total_stride *= s
        base_len = self.clip_len // total_stride
        assert base_len * total_stride == self.clip_len
        c0 = min(self.model_dim * 2 ** (n_layers - 1), self.max_channels)
        chs = _gen_channels(self.model_dim, n_layers, self.max_channels)

        h = z.astype(self.dtype)
        if self.num_classes:
            assert labels is not None, "conditional G needs labels"
            emb = nn.Embed(self.num_classes, self.embed_dim,
                           embedding_init=_KERNEL_INIT, name="label_embed",
                           dtype=self.dtype)(labels)
            h = jnp.concatenate([h, emb], axis=-1)

        h = nn.Dense(base_len * c0, kernel_init=_KERNEL_INIT,
                     bias_init=_BIAS_INIT, dtype=self.dtype, name="project")(h)
        h = h.reshape(h.shape[0], base_len, c0)
        h = nn.relu(h)

        for i, (s, c_out) in enumerate(zip(self.strides, chs)):
            w = self.param(f"convt_{i}_kernel", _KERNEL_INIT,
                           (self.kernel_size, h.shape[-1], c_out), jnp.float32)
            b = self.param(f"convt_{i}_bias", _BIAS_INIT, (c_out,), jnp.float32)
            # bias + ReLU/tanh fused into the conv kernel's epilogue
            h = conv_transpose1d_ba(
                h, w.astype(self.dtype), b.astype(self.dtype), stride=s,
                act="relu" if i < n_layers - 1 else "tanh",
                impl=self.kernels)
        return h.astype(jnp.float32)


class WaveGANDiscriminator(nn.Module):
    model_dim: int = 64
    kernel_size: int = 25
    strides: Sequence[int] = (4, 4, 4, 4, 4)
    phase_shuffle_rad: int = 2
    num_classes: int = 0
    embed_dim: int = 64
    max_channels: int = 1024
    kernels: str = "xla"
    # fuse the first N shuffle sites into their consuming convs
    # (kernels/sconv.py; ModelCfg.fused_shuffle_sites): -1 = all
    fused_shuffle_sites: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray | None = None,
                 train: bool = True) -> jnp.ndarray:
        """x [B, T, 1] -> scores [B]. Phase shuffle only when train=True."""
        n_layers = len(self.strides)
        chs = _disc_channels(self.model_dim, n_layers, self.max_channels)
        n_fused = (n_layers - 1 if self.fused_shuffle_sites < 0
                   else self.fused_shuffle_sites)
        h = x.astype(self.dtype)
        pending_key = None                      # site i feeds conv i+1
        for i, (s, c_out) in enumerate(zip(self.strides, chs)):
            w = self.param(f"conv_{i}_kernel", _KERNEL_INIT,
                           (self.kernel_size, h.shape[-1], c_out), jnp.float32)
            b = self.param(f"conv_{i}_bias", _BIAS_INIT, (c_out,), jnp.float32)
            if pending_key is not None:
                # fused site: shuffle rides the conv's input (same shift
                # stream as ops.phase_shuffle — numerically interchangeable)
                h = sconv1d_ba(h, w.astype(self.dtype), b.astype(self.dtype),
                               pending_key, self.phase_shuffle_rad, stride=s,
                               padding="SAME", act="leaky_relu", slope=0.2,
                               impl=self.kernels)
                pending_key = None
            else:
                # bias + LeakyReLU(0.2) fused into the conv kernel's epilogue
                h = conv1d_ba(h, w.astype(self.dtype), b.astype(self.dtype),
                              stride=s, padding="SAME", act="leaky_relu",
                              slope=0.2, impl=self.kernels)
            if train and self.phase_shuffle_rad and i < n_layers - 1:
                key = self.make_rng("phase_shuffle")
                if i < n_fused:
                    pending_key = key
                else:
                    h = phase_shuffle(h, key, self.phase_shuffle_rad,
                                      impl=self.kernels)
        feat = h.reshape(h.shape[0], -1)
        score = nn.Dense(1, kernel_init=_KERNEL_INIT, bias_init=_BIAS_INIT,
                         dtype=self.dtype, name="head")(feat)[:, 0]
        if self.num_classes:
            assert labels is not None, "conditional D needs labels"
            # projection discriminator: score += <embed(y), pooled features>
            pooled = h.mean(axis=1)
            emb = nn.Embed(self.num_classes, pooled.shape[-1],
                           embedding_init=_KERNEL_INIT, name="proj_embed",
                           dtype=self.dtype)(labels)
            score = score + jnp.sum(pooled * emb, axis=-1)
        return score.astype(jnp.float32)
