"""Pallas TPU kernels (SURVEY layer A1) — the TPU-native analog of the
reference's cuDNN conv1d/convTranspose1d/GRU (SURVEY §2.2).

Selected per-run via config train.kernels="pallas"; the pure-XLA paths in
audiogan_tpu.ops remain the always-available reference implementation and
numerics oracle (tests/pallas/ asserts equivalence, interpret-mode on CPU
and compiled on TPU).

Differentiability contract (SURVEY R2): conv1d sits on the WGAN-GP
double-backprop path and therefore supports reverse-over-reverse AD. Each
public op is a jax.custom_vjp whose backward pass is itself composed of
these public ops (conv1d's dx is a conv_transpose1d; conv_transpose1d's dx
is a conv1d; weight grads are strided einsums) — so every level of reverse
differentiation re-enters ops that again have VJPs, closing the recursion.
"""

from audiogan_tpu.kernels.conv import conv1d, conv_transpose1d
from audiogan_tpu.kernels.gru import gru_cell, gru_scan

__all__ = ["conv1d", "conv_transpose1d", "gru_cell", "gru_scan"]
