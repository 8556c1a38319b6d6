"""Per-clip amplitude normalization (SURVEY C5)."""

from __future__ import annotations

import jax.numpy as jnp


def normalize_amplitude(
    x: jnp.ndarray,
    mode: str = "peak",
    target: float = 0.999,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Normalize each clip (last axis = time) to a target amplitude.

    mode="peak": max |x| -> target.  mode="rms": rms -> target.  "none": no-op.
    Silent clips (all-zero) pass through unchanged (eps guard).
    """
    if mode == "none":
        return x
    if mode == "peak":
        scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    elif mode == "rms":
        scale = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))
    else:
        raise ValueError(f"unknown normalize mode {mode!r}")
    return x * (target / jnp.maximum(scale, eps))
