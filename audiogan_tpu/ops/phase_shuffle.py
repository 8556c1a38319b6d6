"""Phase shuffle (SURVEY C10; WaveGAN regularizer, Donahue et al. 2019).

Random per-example circular-ish time shift by n in [-rad, rad] applied to D's
intermediate activations, with reflection padding at the exposed edge. The
shift amount is data-independent, so the op is differentiable w.r.t. x (the
gradient is the same gather transposed) — required because phase shuffle sits
inside D on the gradient-penalty double-backprop path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def phase_shuffle(x: jnp.ndarray, key: jax.Array, rad: int) -> jnp.ndarray:
    """Shift [B, T, C] activations by per-example n ~ U{-rad..rad} in time.

    Implementation: reflect-pad time by rad on both sides, then per-example
    dynamic_slice of length T starting at (rad - n). vmap'd so each batch
    element gets an independent shift; under jit the whole thing is one
    fused gather.
    """
    if rad == 0:
        return x
    b, t, c = x.shape
    shifts = jax.random.randint(key, (b,), -rad, rad + 1)
    xp = jnp.pad(x, ((0, 0), (rad, rad), (0, 0)), mode="reflect")

    def take(clip, n):
        return lax.dynamic_slice(clip, (rad - n, 0), (t, c))

    return jax.vmap(take)(xp, shifts)
