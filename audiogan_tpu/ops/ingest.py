"""Fused on-device ingest pipeline (SURVEY C1-C5 composed; layer A2).

Reference equivalent: Dataset.__getitem__ host chain
  wav decode -> resample -> mu-law -> random-crop/pad -> normalize  [B:5]
TPU-native inversion: the host only ships raw int16 clips; EVERYTHING else
happens here, inside the same jit (and therefore the same XLA graph) as the
train step, per the single-graph requirement of [B:5].

Pipeline order (SPEC decision, pinned by tests):
  1. int16 -> float32 in [-1, 1)            (divide by 32768)
  2. polyphase resample source->model rate  (skipped when rates match)
  3. random crop (train) / center crop (eval) to clip_len, zero-pad if short
  4. amplitude normalize (peak/rms -> norm_target)
  5. mu-law compand (optional)
Output: float32 [B, clip_len] in [-1, 1]. The sampler applies the exact
inverse tail (mu-law expand) to generated waveforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audiogan_tpu.config import DataCfg
from audiogan_tpu.ops.framing import center_crop, crop_offsets, random_crop
from audiogan_tpu.ops.mulaw import mu_law_compand
from audiogan_tpu.ops.normalize import normalize_amplitude
from audiogan_tpu.ops.resample import resample_poly


def ingest_batch(
    raw: jnp.ndarray,
    cfg: DataCfg,
    key: jax.Array | None = None,
    kernels: str = "xla",
) -> jnp.ndarray:
    """raw int16 [B, store_len] -> float32 [B, clip_len], fully on device.

    `key=None` selects the deterministic eval path (center crop).
    `kernels="pallas"` routes the post-resample tail (crop + cast +
    normalize + mu-law) through the single-pass Pallas kernel
    (kernels/ingest.py) when the geometry allows: training path (random
    crop), identity resample, int16 input, store >= clip. Both paths draw
    crop starts from ops.framing.crop_offsets, so they agree exactly.
    """
    if (kernels in ("pallas", "auto") and key is not None
            # auto selects the fused pass since the zero-slack/alignment
            # rework: interleaved on-HW ratios 0.94-0.99 vs XLA at the
            # flagship slack geometry (scripts/ingest_bench.py 2026-08-17;
            # was 0.87x-slower pre-rework)
            and cfg.sample_rate == cfg.source_rate
            and raw.dtype == jnp.int16
            and cfg.normalize in ("peak", "rms")):
        from audiogan_tpu.kernels.conv import _auto_backend_ok
        from audiogan_tpu.kernels.ingest import ingest_fused, supported

        b, s = raw.shape
        if supported(b, s, cfg.clip_len) and (
                kernels == "pallas" or _auto_backend_ok()):
            offs = crop_offsets(key, b, s - cfg.clip_len)
            return ingest_fused(raw, offs, cfg.clip_len, cfg.normalize,
                                cfg.norm_target,
                                cfg.mu if cfg.mu_law else 0.0)

    x = raw.astype(jnp.float32) / 32768.0
    x = resample_poly(
        x, cfg.sample_rate, cfg.source_rate,
        taps_per_phase=cfg.resample_taps_per_phase, beta=cfg.resample_beta)
    if key is not None:
        x = random_crop(x, key, cfg.clip_len)
    else:
        x = center_crop(x, cfg.clip_len)
    x = normalize_amplitude(x, cfg.normalize, cfg.norm_target)
    if cfg.mu_law:
        x = mu_law_compand(x, cfg.mu)
    return x
