"""WGAN value function + gradient penalty (SURVEY C13; Gulrajani et al. 2017).

Reference equivalent: torch autograd.grad(..., create_graph=True) double
backprop. In JAX the penalty is `jax.grad` nested inside the loss that is
itself differentiated — free composition, provided every op in the critic is
2nd-order differentiable (pinned by tests/models/test_grad2.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def wgan_d_loss(real_scores: jnp.ndarray, fake_scores: jnp.ndarray
                ) -> jnp.ndarray:
    """Critic loss (to minimize): E[D(fake)] - E[D(real)]."""
    return jnp.mean(fake_scores) - jnp.mean(real_scores)


def wgan_g_loss(fake_scores: jnp.ndarray) -> jnp.ndarray:
    """Generator loss (to minimize): -E[D(fake)]."""
    return -jnp.mean(fake_scores)


def gradient_penalty(
    d_apply: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    key: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """WGAN-GP penalty on interpolates x^ = eps*real + (1-eps)*fake.

    d_apply maps a waveform batch [B, T, 1] -> scores [B] (params already
    closed over — the outer jax.grad w.r.t. params differentiates through
    this whole function, which is the double-backprop of [B:5]).

    Returns (penalty mean((||grad_xhat D||_2 - 1)^2), mean gradient norm).
    """
    b = real.shape[0]
    eps = jax.random.uniform(key, (b,) + (1,) * (real.ndim - 1),
                             dtype=real.dtype)
    xhat = eps * real + (1.0 - eps) * fake
    # D factorizes over the batch, so grad of sum == per-example grads.
    grads = jax.grad(lambda v: jnp.sum(d_apply(v)))(xhat)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads).reshape(b, -1), axis=-1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0)), jnp.mean(norms)
