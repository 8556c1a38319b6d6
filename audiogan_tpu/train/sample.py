"""Seeded, deterministic sampling (SURVEY C16, §3.3; [B:5] fidelity clause).

One jit'd graph: z = normal(seed) -> G -> inverse mu-law expand -> waveform.
Identical (params, seed, num, labels) produce bit-identical waveforms on a
given backend — pinned by tests/train/test_sample.py and the golden tests.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.config import Config
from audiogan_tpu.models import build_generator
from audiogan_tpu.ops.mulaw import mu_law_expand


def build_sample_fn(cfg: Config) -> Callable:
    """Returns jit'd fn(params_g, key, labels|None) -> waveforms [N, T]."""
    g = build_generator(cfg)
    conditional = cfg.data.num_classes > 0

    @functools.partial(jax.jit, static_argnames=("num",))
    def sample_fn(params_g, key, labels=None, *, num: int = 1):
        z = jax.random.normal(key, (num, cfg.model.latent_dim))
        y = (g.apply(params_g, z, labels) if conditional
             else g.apply(params_g, z))[..., 0]
        if cfg.data.mu_law:
            y = mu_law_expand(y, cfg.data.mu)
        return y

    return sample_fn


def generate(cfg: Config, params_g, num: int, seed: int,
             labels: np.ndarray | None = None) -> np.ndarray:
    """Convenience host entry: seeded generation -> float32 numpy [num, T]."""
    fn = build_sample_fn(cfg)
    key = jax.random.key(seed)
    lab = None
    if cfg.data.num_classes:
        if labels is None:
            lab = jax.random.randint(jax.random.fold_in(key, 1), (num,), 0,
                                     cfg.data.num_classes)
        else:
            lab = jnp.asarray(labels, jnp.int32)
    return np.asarray(fn(params_g, key, lab, num=num))
