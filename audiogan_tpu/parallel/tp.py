"""Tensor (channel) parallelism for conv stacks (SURVEY §2.3 TP row).

Megatron-style pairing adapted to 1D convs: inside a shard_map over the
'model' axis,

  tp_conv1d_col: weights sharded on C_out — each shard computes its slice of
      the output channels from the full input (no communication);
  tp_conv1d_row: weights sharded on C_in — each shard convolves its input-
      channel slice and the partial outputs are summed with ONE psum.

A col->row pair therefore costs a single all-reduce, with the elementwise
nonlinearity applied on the sharded activations in between — the conv analog
of Megatron's column/row-parallel Linear pair. Models stay DP-only by
default (SURVEY: params are small); these ops are the building blocks for
scaling channel counts past one chip's HBM/FLOPs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from audiogan_tpu.ops.conv import conv1d as conv1d_impl


def tp_conv1d_col(x: jnp.ndarray, w_shard: jnp.ndarray, stride: int,
                  axis: str, impl: str = "xla") -> jnp.ndarray:
    """Column-parallel conv: full x [B,T,Cin], w shard [K,Cin,Cout/tp] ->
    sharded activations [B,T',Cout/tp]. No collective."""
    del axis  # no communication; kept for API symmetry
    return conv1d_impl(x, w_shard, stride=stride, padding="SAME", impl=impl)


def tp_conv1d_row(x_shard: jnp.ndarray, w_shard: jnp.ndarray, stride: int,
                  axis: str, impl: str = "xla") -> jnp.ndarray:
    """Row-parallel conv: sharded x [B,T,Cin/tp], w shard [K,Cin/tp,Cout] ->
    full activations [B,T',Cout] via one psum over the model axis."""
    partial = conv1d_impl(x_shard, w_shard, stride=stride, padding="SAME",
                          impl=impl)
    return lax.psum(partial, axis)
