"""Fixed-length framing: random / center crop with static pad (SURVEY C4).

Reference equivalent: random-crop/pad inside Dataset.__getitem__ [B:5]. Here
crops happen on device inside the jit'd ingest: offsets come from threaded
PRNG keys, slices are `lax.dynamic_slice` (static sizes, traced starts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pad_to(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    in_len = x.shape[-1]
    if in_len >= out_len:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, out_len - in_len)]
    return jnp.pad(x, pad)


def crop_offsets(key: jax.Array, batch: int, max_off: int) -> jnp.ndarray:
    """The per-example crop-start draw — factored so the fused Pallas ingest
    (kernels/ingest.py) consumes the SAME offsets as this XLA path and the
    two are bit-comparable."""
    return jax.random.randint(key, (batch,), 0, max_off + 1)


def random_crop(x: jnp.ndarray, key: jax.Array, out_len: int) -> jnp.ndarray:
    """Per-example random crop of [B, T] -> [B, out_len] (zero-pad if short)."""
    x = _pad_to(x, out_len)
    b, t = x.shape
    max_off = t - out_len  # static, >= 0
    offs = crop_offsets(key, b, max_off)

    def crop_one(clip, off):
        return lax.dynamic_slice(clip, (off,), (out_len,))

    return jax.vmap(crop_one)(x, offs)


def center_crop(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Deterministic center crop of [..., T] -> [..., out_len]."""
    x = _pad_to(x, out_len)
    t = x.shape[-1]
    start = (t - out_len) // 2
    return lax.slice_in_dim(x, start, start + out_len, axis=-1)
