"""1D conv / transposed-conv dispatch point (SURVEY C7/C9 substrate).

This is the seam between the model layer (A4) and the kernel layer (A1):
models call `conv1d` / `conv_transpose1d` with an `impl` string and never
touch lax or Pallas directly.

  impl="xla"    pure-XLA lowering (lax.conv for strided conv, polyphase
                stride-1 conv for conv-transpose) — always available,
                infinitely differentiable (the gradient-penalty
                double-backprop path [B:5] needs 2nd-order AD).
  impl="pallas" hand-written TPU kernels in audiogan_tpu.kernels, with
                custom VJPs whose backward passes are themselves built from
                these kernels so reverse-over-reverse AD composes.

BOTH impls route through the audiogan_conv1d/convt1d JAX primitives
(kernels/primitives.py) so that gradients always use OUR transpose rules.
This is a correctness requirement on this platform, not a convenience: the
axon TPU backend miscompiles lax lhs_dilation convolutions for some
geometries (k=2s+1, pad=s — e.g. every kernel_size=9/stride=4 layer),
and lax.conv's own data-gradient emits exactly that op. See
kernels/conv.py::_convt_polyphase_xla for the on-chip evidence.

Layout: activations [B, T, C] (NWC — channels on the TPU lane dim),
weights [K, C_in, C_out] (WIO).
"""

from __future__ import annotations

import jax.numpy as jnp


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: str | tuple[int, int] = "SAME",
    impl: str = "xla",
) -> jnp.ndarray:
    """Strided cross-correlation: [B,T,C_in] x [K,C_in,C_out] -> [B,T',C_out]."""
    from audiogan_tpu.kernels.conv import conv1d as kernel_conv1d
    return kernel_conv1d(x, w, stride=stride, padding=padding, impl=impl)


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    impl: str = "xla",
) -> jnp.ndarray:
    """Fractionally-strided conv: [B,T,C_in] -> [B, T*stride, C_out].

    Semantics: input-dilated conv (stride-1 zeros between inputs, centered
    filter, SAME-style padding) — output length is exactly T*stride. The
    lowering never materializes the dilation (see module docstring).
    """
    from audiogan_tpu.kernels.conv import \
        conv_transpose1d as kernel_convt1d
    return kernel_convt1d(x, w, stride=stride, impl=impl)


def conv1d_ba(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    stride: int = 1,
    padding: str | tuple[int, int] = "SAME",
    act: str = "none",
    slope: float = 0.2,
    impl: str = "xla",
) -> jnp.ndarray:
    """Fused act(conv1d(x, w) + b): the bias + LeakyReLU/ReLU/tanh epilogue
    is applied inside the Pallas kernel's final accumulator write (one HBM
    round-trip of the activation saved per layer); the XLA tier composes
    the same math from fusable ops. act in none|relu|leaky_relu|tanh."""
    from audiogan_tpu.kernels.conv import conv1d_ba as kernel_conv1d_ba
    return kernel_conv1d_ba(x, w, b, stride=stride, padding=padding,
                            act=act, slope=slope, impl=impl)


def conv_transpose1d_ba(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    stride: int,
    act: str = "none",
    slope: float = 0.2,
    impl: str = "xla",
) -> jnp.ndarray:
    """Fused act(conv_transpose1d(x, w) + b) — see conv1d_ba."""
    from audiogan_tpu.kernels.conv import \
        conv_transpose1d_ba as kernel_convt1d_ba
    return kernel_convt1d_ba(x, w, b, stride=stride, act=act, slope=slope,
                             impl=impl)
