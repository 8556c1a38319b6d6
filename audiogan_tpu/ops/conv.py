"""1D conv / transposed-conv dispatch point (SURVEY C7/C9 substrate).

This is the seam between the model layer (A4) and the kernel layer (A1):
models call `conv1d` / `conv_transpose1d` with an `impl` string and never
touch lax or Pallas directly.

  impl="xla"    lax.conv_general_dilated / lax.conv_transpose — always
                available, infinitely differentiable (the gradient-penalty
                double-backprop path [B:5] needs 2nd-order AD).
  impl="pallas" hand-written TPU kernels in audiogan_tpu.kernels, with
                custom VJPs whose backward passes are themselves built from
                these kernels so reverse-over-reverse AD composes.

Layout: activations [B, T, C] (NWC — channels on the TPU lane dim),
weights [K, C_in, C_out] (WIO).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: str | tuple[int, int] = "SAME",
    impl: str = "xla",
) -> jnp.ndarray:
    """Strided cross-correlation: [B,T,C_in] x [K,C_in,C_out] -> [B,T',C_out]."""
    if impl == "pallas":
        from audiogan_tpu.kernels import conv1d as pallas_conv1d
        return pallas_conv1d(x, w, stride=stride, padding=padding)
    if isinstance(padding, tuple):
        padding = [padding]
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    impl: str = "xla",
) -> jnp.ndarray:
    """Fractionally-strided conv: [B,T,C_in] -> [B, T*stride, C_out].

    Defined as the input-dilated conv (insert stride-1 zeros between inputs,
    then SAME cross-correlation) — output length is exactly T*stride.
    """
    if impl == "pallas":
        from audiogan_tpu.kernels import conv_transpose1d as pallas_convt1d
        return pallas_convt1d(x, w, stride=stride)
    k = w.shape[0]
    t = x.shape[1]
    out_len = t * stride
    dilated_len = (t - 1) * stride + 1
    # SAME-style padding for the dilated conv so out_len == t * stride:
    total_pad = out_len - 1 + k - dilated_len
    pad_lo = (k - 1) // 2  # centered filter
    pad_hi = total_pad - pad_lo
    return lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
