"""GRU (SampleRNN-style frame-level RNN) generator (SURVEY C8, [B:9]).

Design per SURVEY §3.5: the recurrence runs at FRAME rate, never sample
rate — `lax.scan` over n_frames = clip_len / gru_frame_size steps (e.g.
16384/64 = 256), each step emitting a frame feature vector; a transposed-conv
stack then upsamples frames to samples. Autoregressive conditioning: the
GRU input at step t is a projection of the frame features emitted at t-1,
concatenated with the static (z, label) conditioning vector. Generation
reuses the identical scan, so sampling is one compiled graph, TPU-friendly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiogan_tpu.ops.conv import conv_transpose1d_ba
from audiogan_tpu.ops.gru import gru_cell

_KERNEL_INIT = nn.initializers.glorot_uniform()
_BIAS_INIT = nn.initializers.zeros_init()


def factorize_stride(n: int) -> tuple[int, ...]:
    """Factor an upsample ratio into a stride tuple (prefer 4s, then small)."""
    out = []
    for f in (4, 3, 2, 5, 7):
        while n % f == 0:
            out.append(f)
            n //= f
    if n != 1:
        out.append(n)
    return tuple(out)


class GRUGenerator(nn.Module):
    clip_len: int = 16384
    latent_dim: int = 100
    model_dim: int = 64
    hidden: int = 512
    frame_size: int = 64          # samples per GRU step after upsampling
    kernel_size: int = 25
    num_classes: int = 0
    embed_dim: int = 64
    kernels: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, labels: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
        """z [B, latent_dim] (+labels [B]) -> waveform [B, clip_len, 1]."""
        b = z.shape[0]
        n_frames = self.clip_len // self.frame_size
        feat_dim = min(4 * self.model_dim, 512)

        cond = z.astype(self.dtype)
        if self.num_classes:
            assert labels is not None, "conditional GRU G needs labels"
            emb = nn.Embed(self.num_classes, self.embed_dim,
                           embedding_init=_KERNEL_INIT, name="label_embed",
                           dtype=self.dtype)(labels)
            cond = jnp.concatenate([cond, emb], axis=-1)

        h0 = jnp.tanh(nn.Dense(self.hidden, kernel_init=_KERNEL_INIT,
                               bias_init=_BIAS_INIT, dtype=self.dtype,
                               name="init_state")(cond))
        cond_proj = nn.Dense(feat_dim, kernel_init=_KERNEL_INIT,
                             bias_init=_BIAS_INIT, dtype=self.dtype,
                             name="cond_proj")(cond)

        in_dim = 2 * feat_dim  # concat(ar_proj(prev_feat), cond_proj)
        w_i = self.param("gru_w_i", _KERNEL_INIT, (in_dim, 3 * self.hidden),
                         jnp.float32)
        w_h = self.param("gru_w_h", nn.initializers.orthogonal(),
                         (self.hidden, 3 * self.hidden), jnp.float32)
        b_i = self.param("gru_b_i", _BIAS_INIT, (3 * self.hidden,), jnp.float32)
        b_h = self.param("gru_b_h", _BIAS_INIT, (3 * self.hidden,), jnp.float32)
        w_ar = self.param("ar_proj", _KERNEL_INIT, (feat_dim, feat_dim),
                          jnp.float32)
        w_out = self.param("frame_out", _KERNEL_INIT, (self.hidden, feat_dim),
                           jnp.float32)
        b_out = self.param("frame_out_bias", _BIAS_INIT, (feat_dim,),
                           jnp.float32)

        dt = self.dtype
        w_i_, w_h_, b_i_, b_h_ = (p.astype(dt) for p in (w_i, w_h, b_i, b_h))
        w_ar_, w_out_, b_out_ = (p.astype(dt) for p in (w_ar, w_out, b_out))

        from audiogan_tpu.kernels.conv import _auto_backend_ok
        use_fused = (self.kernels == "pallas"
                     or (self.kernels == "auto" and _auto_backend_ok()))
        if use_fused:  # the fused scan WINS on-HW
            # whole recurrence as ONE persistent TPU kernel (weights stay
            # resident in VMEM across frames — see kernels.gru.gru_scan)
            from audiogan_tpu.kernels import gru_scan
            feats = gru_scan(h0, cond_proj, w_i_, w_h_, b_i_, b_h_,
                             w_ar_, w_out_, b_out_, n_frames)
        else:
            def step(carry, _):
                h, prev_feat = carry
                x = jnp.concatenate([prev_feat @ w_ar_, cond_proj], axis=-1)
                h = gru_cell(x, h, w_i_, w_h_, b_i_, b_h_, impl="xla")
                feat = jnp.tanh(h @ w_out_ + b_out_)
                return (h, feat), feat

            # zeros_like keeps cond_proj's vma type so the scan carry stays
            # uniform when this module runs inside a vma-checked shard_map
            f0 = jnp.zeros_like(cond_proj)
            (_, _), feats = jax.lax.scan(step, (h0, f0), None,
                                         length=n_frames)
            feats = jnp.transpose(feats, (1, 0, 2))      # [B, n_frames, F]

        # conv_transpose upsample: frames -> samples (frame_size x)
        h = feats
        strides = factorize_stride(self.frame_size)
        chs = [max(feat_dim // 2 ** (i + 1), self.model_dim)
               for i in range(len(strides) - 1)] + [1]
        for i, (s, c_out) in enumerate(zip(strides, chs)):
            w = self.param(f"up_{i}_kernel", _KERNEL_INIT,
                           (self.kernel_size, h.shape[-1], c_out), jnp.float32)
            bb = self.param(f"up_{i}_bias", _BIAS_INIT, (c_out,), jnp.float32)
            # bias + ReLU/tanh fused into the conv kernel's epilogue
            h = conv_transpose1d_ba(
                h, w.astype(dt), bb.astype(dt), stride=s,
                act="relu" if i < len(strides) - 1 else "tanh",
                impl=self.kernels)
        return h.astype(jnp.float32)
