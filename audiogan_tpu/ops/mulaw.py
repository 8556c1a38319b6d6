"""Mu-law companding (SURVEY C3; ITU-T G.711 constants, mu=255).

Reference equivalent: a ~15-line numpy helper in the ingest path [B:5].
Here both directions are pure jnp elementwise ops so XLA fuses them into the
ingest graph and the sampler's output graph respectively.
"""

from __future__ import annotations

import jax.numpy as jnp


def mu_law_compand(x: jnp.ndarray, mu: float = 255.0) -> jnp.ndarray:
    """Compand x in [-1, 1] -> [-1, 1]: sign(x) * log1p(mu|x|) / log1p(mu)."""
    mu = jnp.asarray(mu, x.dtype)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def mu_law_expand(y: jnp.ndarray, mu: float = 255.0) -> jnp.ndarray:
    """Inverse compand: sign(y) * ((1+mu)^|y| - 1) / mu."""
    mu = jnp.asarray(mu, y.dtype)
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(mu))) / mu
