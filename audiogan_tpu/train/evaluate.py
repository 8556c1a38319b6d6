"""Quantitative evaluation of a trained generator (SURVEY A6 `eval`).

The reference's only evaluation was listening to samples; here `audiogan
eval` reports objective statistics comparing a batch of generated clips
against real corpus clips, all computed on device:

  spectral_distance   multi-resolution batch-mean-spectrum distance
                      (losses.batch_spectral_matching_loss)
  rms / rms_real      mean per-clip RMS of fake vs real
  zero_crossing_rate  mean ZCR of fake vs real (coarse pitch/noisiness)
  peak                mean per-clip peak amplitude

Deterministic in (ckpt, seed).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from audiogan_tpu.config import Config
from audiogan_tpu.data.corpus import Corpus, HostBatcher
from audiogan_tpu.losses import batch_spectral_matching_loss
from audiogan_tpu.ops.ingest import ingest_batch
from audiogan_tpu.ops.mulaw import mu_law_expand
from audiogan_tpu.train.sample import build_sample_fn


def _stats(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1))
    zcr = jnp.mean(jnp.abs(jnp.diff(jnp.sign(x), axis=-1)) > 0, axis=-1)
    peak = jnp.max(jnp.abs(x), axis=-1)
    return {"rms": jnp.mean(rms), "zcr": jnp.mean(zcr),
            "peak": jnp.mean(peak)}


def evaluate(cfg: Config, params_g: Any, corpus: Corpus, num: int = 64,
             seed: int = 0) -> dict[str, float]:
    sample_fn = build_sample_fn(cfg)
    key = jax.random.key(seed)
    labels = None
    if cfg.data.num_classes:
        labels = jax.random.randint(jax.random.fold_in(key, 1), (num,), 0,
                                    cfg.data.num_classes)
    fake = sample_fn(params_g, key, labels, num=num)      # [N, T], expanded

    batcher = HostBatcher(corpus, batch_size=num, n_views=1, seed=seed)
    clips, _ = batcher.get(0)
    real = ingest_batch(jnp.asarray(clips[0]), cfg.data, None)
    if cfg.data.mu_law:
        real = mu_law_expand(real, cfg.data.mu)

    @jax.jit
    def metrics_fn(fake, real):
        out = {"spectral_distance": batch_spectral_matching_loss(
            fake, real, cfg.model.stft_resolutions)}
        fs, rs = _stats(fake), _stats(real)
        out.update({k: v for k, v in fs.items()})
        out.update({f"{k}_real": v for k, v in rs.items()})
        return out

    return {k: round(float(v), 6)
            for k, v in jax.device_get(metrics_fn(fake, real)).items()}
