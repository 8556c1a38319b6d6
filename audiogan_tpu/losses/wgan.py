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
    batch_chunks: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """WGAN-GP penalty on interpolates x^ = eps*real + (1-eps)*fake.

    d_apply maps a waveform batch [B, T, 1] -> scores [B] (params already
    closed over — the outer jax.grad w.r.t. params differentiates through
    this whole function, which is the double-backprop of [B:5]).

    batch_chunks > 1 bounds peak memory for long-clip configs ([B:11],
    SURVEY §5 "blockwise computation"): the interpolate batch is split into
    chunks evaluated sequentially under lax.map with rematerialization, so
    only one chunk's critic activations are ever live. (Chunking is over
    the batch, not time, because the critic ends in a global dense head.)

    Returns (penalty mean((||grad_xhat D||_2 - 1)^2), mean gradient norm).
    """
    b = real.shape[0]
    eps = jax.random.uniform(key, (b,) + (1,) * (real.ndim - 1),
                             dtype=real.dtype)
    xhat = eps * real + (1.0 - eps) * fake

    def norms_of(v):
        # D factorizes over the batch, so grad of sum == per-example grads.
        grads = jax.grad(lambda u: jnp.sum(d_apply(u)))(v)
        return jnp.sqrt(
            jnp.sum(jnp.square(grads).reshape(v.shape[0], -1), axis=-1)
            + 1e-12)

    if batch_chunks > 1:
        if b % batch_chunks != 0:
            raise ValueError(f"batch {b} not divisible by gp batch_chunks "
                             f"{batch_chunks}")
        chunked = xhat.reshape((batch_chunks, b // batch_chunks)
                               + xhat.shape[1:])
        norms = jax.lax.map(jax.checkpoint(norms_of), chunked).reshape(b)
    else:
        norms = norms_of(xhat)
    return jnp.mean(jnp.square(norms - 1.0)), jnp.mean(norms)
