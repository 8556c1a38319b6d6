"""Pallas 1D conv kernels (SURVEY C7/C9 native tier; replaces cuDNN conv).

Kernel strategy (v5e: MXU 128x128, VPU 8x128, VMEM ~16MB/core):

* conv1d (stride s, kernel K): after SAME-padding and reshaping time into
  [rows, s] "phase rows", output y[t] = sum_j x_rows[t + j//s, j%s] @ w[j] —
  K shifted [T_tile, Cin_blk] x [Cin_blk, Cout_blk] MXU matmuls per tile,
  accumulated in an f32 VMEM scratch. Grid (B, T, Cout, Cin) with the Cin
  axis innermost, revisiting the output block to accumulate channel blocks.

* conv_transpose1d (fractionally strided): polyphase decomposition — output
  phase rho = u % s collects taps {j : (pad_lo - j) % s == rho} with input
  row offset q_j = (rho + j - pad_lo) / s, so each tap is again one shifted
  MXU matmul, accumulated into acc[:, rho, :]; the output is written as
  [T_rows, s, Cout] and reshaped back outside.

Both wrappers fall back to the XLA path when the shape is hostile to the
MXU (Cin < MIN_CIN, i.e. the waveform->features first layer) — documented,
tested, and cheap there anyway.

Input time-blocks overlap by the conv halo, which BlockSpec index maps
cannot express, so x stays in ANY/HBM memory space and each grid step DMAs
its (haloed) slice into a VMEM scratch via make_async_copy.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shapes too skinny for the MXU take the XLA path
MIN_CIN = 8
_INTERPRET = False  # flipped by tests on CPU


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _same_pads(t_in: int, k: int, s: int) -> tuple[int, int, int]:
    """SAME padding for stride-s conv: t_out = ceil(t_in / s)."""
    t_out = _cdiv(t_in, s)
    total = max((t_out - 1) * s + k - t_in, 0)
    lo = total // 2
    return t_out, lo, total - lo


# ---------------------------------------------------------------------------
# strided conv1d
# ---------------------------------------------------------------------------

def _conv1d_kernel(x_hbm, w_ref, o_ref, xs, sem, *, k, s, t_tile,
                   cin_blk, rows_tile, full_ci, grid_dims):
    b, ti, co, ci = (pl.program_id(i) for i in range(4))
    nb, nt, nco, nci = grid_dims
    total = nb * nt * nco * nci
    linear = ((b * nt + ti) * nco + co) * nci + ci
    slot = linear % 2

    # Double-buffered haloed input DMA: step L starts step L+1's copy into
    # the other slot before waiting on its own, hiding HBM latency behind
    # the K matmuls. Mosaic requires HBM slice sizes on the lane dim to be
    # 128-aligned, so channel slicing only happens when cin_blk is a
    # multiple of 128 (full_ci covers cin <= 128 with a full-dim copy).
    def make_dma(b_, ti_, ci_, slot_):
        if full_ci:
            src = x_hbm.at[b_, pl.ds(ti_ * t_tile, rows_tile), :, :]
        else:
            src = x_hbm.at[b_, pl.ds(ti_ * t_tile, rows_tile), :,
                           pl.ds(ci_ * cin_blk, cin_blk)]
        return pltpu.make_async_copy(src, xs.at[slot_], sem.at[slot_])

    @pl.when(linear == 0)
    def _():
        make_dma(b, ti, ci, slot).start()

    nxt = linear + 1

    @pl.when(nxt < total)
    def _():
        ci_n = nxt % nci
        rest = nxt // nci
        ti_n = (rest // nco) % nt
        b_n = rest // (nco * nt)
        make_dma(b_n, ti_n, ci_n, nxt % 2).start()

    make_dma(b, ti, ci, slot).wait()

    def tap(j, a):
        q, r = j // s, j % s
        lhs = xs[slot, pl.ds(q, t_tile), r, :]        # [t_tile, cin_blk]
        return a + jnp.dot(lhs, w_ref[j],
                           preferred_element_type=jnp.float32)

    a = jnp.zeros((t_tile, o_ref.shape[-1]), jnp.float32)
    for j in range(k):                                 # static unroll
        a = tap(j, a)

    @pl.when(ci == 0)
    def _():
        o_ref[0] = a.astype(o_ref.dtype)

    @pl.when(ci != 0)
    def _():
        o_ref[0] = o_ref[0] + a.astype(o_ref.dtype)


def _round_up(a: int, m: int) -> int:
    return _cdiv(a, m) * m


def _pad_channels(x, w):
    """Pad Cin to a multiple of 128: Mosaic requires HBM memref slices to be
    128-aligned on the lane dim, and the MXU pads lanes anyway so the extra
    zero channels cost nothing in compute."""
    cin = w.shape[1]
    cin_p = _round_up(cin, 128)
    if cin_p != cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cin_p - cin)))
        w = jnp.pad(w, ((0, 0), (0, cin_p - cin), (0, 0)))
    return x, w


def _conv1d_pallas(x: jnp.ndarray, w: jnp.ndarray, s: int,
                   pad_lo: int, pad_hi: int, t_out: int) -> jnp.ndarray:
    x, w = _pad_channels(x, w)
    b, t_in, cin = x.shape
    k, _, cout = w.shape
    t_tile = min(t_out, 512)
    n_t = _cdiv(t_out, t_tile)
    cin_blk = min(cin, 256)                # multiples of 128 by construction
    cout_blk = min(cout, 256)
    n_ci, n_co = _cdiv(cin, cin_blk), _cdiv(cout, cout_blk)
    qmax = (k - 1) // s
    rows_tile = t_tile + qmax

    # pad time so every tile's haloed DMA stays in bounds:
    rows_needed = n_t * t_tile + qmax
    t_pad_total = rows_needed * s
    x_pad = jnp.pad(x, ((0, 0), (pad_lo, t_pad_total - t_in - pad_lo),
                        (0, 0)))
    x_rows = x_pad.reshape(b, rows_needed, s, cin)

    grid = (b, n_t, n_co, n_ci)
    out = pl.pallas_call(
        functools.partial(_conv1d_kernel, k=k, s=s, t_tile=t_tile,
                          cin_blk=cin_blk, rows_tile=rows_tile,
                          full_ci=(n_ci == 1), grid_dims=grid),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x_rows stays in HBM
            pl.BlockSpec((k, cin_blk, cout_blk),
                         lambda b_, t_, co_, ci_: (0, ci_, co_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, cout_blk),
                               lambda b_, t_, co_, ci_: (b_, t_, co_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_t * t_tile, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_tile, s, cin_blk), x.dtype),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_out * k * cin * cout,
            bytes_accessed=(b * t_pad_total * cin + k * cin * cout
                            + b * t_out * cout) * 4,
            transcendentals=0),
        interpret=_INTERPRET,
    )(x_rows, w)
    return out[:, :t_out, :]


# ---------------------------------------------------------------------------
# conv_transpose1d (fractionally-strided conv, polyphase kernel)
# ---------------------------------------------------------------------------

def _convt_kernel(x_hbm, w_ref, o_ref, xs, acc, sem, *, k, s, pad_lo,
                  t_tile, cin_blk, rows_tile, qneg, full_ci, grid_dims):
    b, ti, co, ci = (pl.program_id(i) for i in range(4))
    nb, nt, nco, nci = grid_dims
    total = nb * nt * nco * nci
    linear = ((b * nt + ti) * nco + co) * nci + ci
    slot = linear % 2

    # x_hbm is [B, R, 1, C]: rows land on an untiled dim so arbitrary row
    # slices are legal; channel slices only when 128-aligned (see conv1d).
    # Double-buffered DMA as in _conv1d_kernel.
    def make_dma(b_, ti_, ci_, slot_):
        if full_ci:
            src = x_hbm.at[b_, pl.ds(ti_ * t_tile, rows_tile), :, :]
        else:
            src = x_hbm.at[b_, pl.ds(ti_ * t_tile, rows_tile), :,
                           pl.ds(ci_ * cin_blk, cin_blk)]
        return pltpu.make_async_copy(src, xs.at[slot_], sem.at[slot_])

    @pl.when(linear == 0)
    def _():
        make_dma(b, ti, ci, slot).start()

    nxt = linear + 1

    @pl.when(nxt < total)
    def _():
        ci_n = nxt % nci
        rest = nxt // nci
        ti_n = (rest // nco) % nt
        b_n = rest // (nco * nt)
        make_dma(b_n, ti_n, ci_n, nxt % 2).start()

    make_dma(b, ti, ci, slot).wait()

    acc[...] = jnp.zeros_like(acc)
    for j in range(k):                                  # static unroll
        rho = (pad_lo - j) % s
        q = (rho + j - pad_lo) // s
        lhs = xs[slot, pl.ds(q + qneg, t_tile), 0, :]   # [t_tile, cin_blk]
        acc[:, rho, :] += jnp.dot(lhs, w_ref[j],
                                  preferred_element_type=jnp.float32)

    @pl.when(ci == 0)
    def _():
        o_ref[0] = acc[...].astype(o_ref.dtype)

    @pl.when(ci != 0)
    def _():
        o_ref[0] = o_ref[0] + acc[...].astype(o_ref.dtype)


def _convt_pallas(x, w, s, pad_lo, out_len):
    x, w = _pad_channels(x, w)
    b, t_in, cin = x.shape
    k, _, cout = w.shape
    assert out_len % s == 0, "conv_transpose output must be stride-aligned"
    m_out = out_len // s                                # output phase-rows
    t_tile = min(m_out, 512)
    n_t = _cdiv(m_out, t_tile)
    cin_blk = min(cin, 256)                # multiples of 128 by construction
    cout_blk = min(cout, 256)
    n_ci, n_co = _cdiv(cin, cin_blk), _cdiv(cout, cout_blk)
    qneg = _cdiv(pad_lo, s)                             # front halo rows
    qpos = _cdiv(max(k - 1 - pad_lo, 0), s)
    rows_tile = t_tile + qneg + qpos

    rows_needed = n_t * t_tile + qneg + qpos
    x_pad = jnp.pad(x, ((0, 0), (qneg, rows_needed - t_in - qneg), (0, 0)))
    x_pad = x_pad[:, :, None, :]                        # [B, R, 1, C]

    grid = (b, n_t, n_co, n_ci)
    out = pl.pallas_call(
        functools.partial(_convt_kernel, k=k, s=s, pad_lo=pad_lo,
                          t_tile=t_tile, cin_blk=cin_blk,
                          rows_tile=rows_tile, qneg=qneg,
                          full_ci=(n_ci == 1), grid_dims=grid),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, cin_blk, cout_blk),
                         lambda b_, t_, co_, ci_: (0, ci_, co_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, s, cout_blk),
                               lambda b_, t_, co_, ci_: (b_, t_, 0, co_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_t * t_tile, s, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_tile, 1, cin_blk), x.dtype),  # double buffer
            pltpu.VMEM((t_tile, s, cout_blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_out * k * cin * cout,
            bytes_accessed=(b * t_in * cin + k * cin * cout
                            + b * out_len * cout) * 4,
            transcendentals=0),
        interpret=_INTERPRET,
    )(x_pad, w)
    out = out.reshape(b, n_t * t_tile * s, cout)
    return out[:, :out_len, :]



# ---------------------------------------------------------------------------
# lowerings used by kernels.primitives + public API
# ---------------------------------------------------------------------------

def conv1d_lowered(x, w, stride, pad_lo, pad_hi):
    """Lowering body for the audiogan_conv1d primitive (pallas or XLA)."""
    cin = w.shape[1]
    t_in, k = x.shape[1], w.shape[0]
    t_out = (t_in + pad_lo + pad_hi - k) // stride + 1
    if cin < MIN_CIN:
        return lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding=[(pad_lo, pad_hi)],
            dimension_numbers=("NWC", "WIO", "NWC"))
    if x.dtype != jnp.float32:
        # sub-f32 dtypes change Mosaic's sublane tiling (2 packed values per
        # word for bf16), which breaks the [B,R,s,C] slicing layout; the
        # kernel accumulates in f32 anyway, so compute in f32 and cast back.
        y = _conv1d_pallas(x.astype(jnp.float32), w.astype(jnp.float32),
                           stride, pad_lo, pad_hi, t_out)
        return y.astype(x.dtype)
    return _conv1d_pallas(x, w, stride, pad_lo, pad_hi, t_out)


def convt1d_lowered(x, w, stride, pad_lo, out_len):
    """Lowering body for the audiogan_convt1d primitive (pallas or XLA)."""
    cin = w.shape[1]
    if cin < MIN_CIN or out_len % stride != 0:
        k = w.shape[0]
        t = x.shape[1]
        dilated_len = (t - 1) * stride + 1
        total_pad = out_len - 1 + k - dilated_len
        return lax.conv_general_dilated(
            x, w, window_strides=(1,),
            padding=[(pad_lo, total_pad - pad_lo)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"))
    if x.dtype != jnp.float32:
        y = _convt_pallas(x.astype(jnp.float32), w.astype(jnp.float32),
                          stride, pad_lo, out_len)
        return y.astype(x.dtype)
    return _convt_pallas(x, w, stride, pad_lo, out_len)


def _same_pads_public(t_in, k, stride, padding):
    if padding == "SAME":
        return _same_pads(t_in, k, stride)
    lo, hi = padding
    t_out = (t_in + lo + hi - k) // stride + 1
    return t_out, lo, hi


def conv1d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: Any = "SAME") -> jnp.ndarray:
    """Strided cross-correlation [B,T,Cin] x [K,Cin,Cout] -> [B,T',Cout].

    Differentiable to arbitrary order in fwd and rev mode (primitive with
    bilinear jvp + transpose rules, SURVEY R2).
    """
    from audiogan_tpu.kernels.primitives import conv1d_prim
    _, lo, hi = _same_pads_public(x.shape[1], w.shape[0], stride, padding)
    return conv1d_prim(x, w, stride=stride, pad_lo=lo, pad_hi=hi)


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                     pad_lo: int | None = None,
                     out_len: int | None = None) -> jnp.ndarray:
    """Fractionally-strided conv [B,T,Cin] -> [B,out_len,Cout].

    Defaults (pad_lo=(K-1)//2, out_len=T*stride) match the XLA path in
    ops.conv. Arbitrary-order differentiable (see conv1d).
    """
    from audiogan_tpu.kernels.primitives import convt1d_prim
    k = w.shape[0]
    if pad_lo is None:
        pad_lo = (k - 1) // 2
    if out_len is None:
        out_len = x.shape[1] * stride
    return convt1d_prim(x, w, stride=stride, pad_lo=pad_lo, out_len=out_len)
