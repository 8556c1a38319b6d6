"""GRU cell (SURVEY C8 substrate) — dispatch point for the Pallas fused cell.

Gate convention matches torch.nn.GRUCell exactly (our numerics oracle,
SURVEY §4.1), gates ordered (r, z, n):

    r  = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z  = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n  = tanh   (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

Weights are stored pre-transposed for right-multiplication: w_i [in, 3H],
w_h [H, 3H], biases [3H], gate blocks concatenated in (r, z, n) order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_cell(
    x: jnp.ndarray,
    h: jnp.ndarray,
    w_i: jnp.ndarray,
    w_h: jnp.ndarray,
    b_i: jnp.ndarray,
    b_h: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """One GRU step: x [B, in], h [B, H] -> h' [B, H]."""
    if impl == "pallas":
        from audiogan_tpu.kernels import gru_cell as pallas_gru_cell
        return pallas_gru_cell(x, h, w_i, w_h, b_i, b_h)
    gi = x @ w_i + b_i                       # [B, 3H] — one MXU matmul
    gh = h @ w_h + b_h                       # [B, 3H]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h
