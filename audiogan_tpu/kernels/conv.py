"""Pallas 1D conv kernels (SURVEY C7/C9 native tier; replaces cuDNN conv).

Kernel strategy v2 (v5e: MXU 128x128, VPU 8x128, VMEM ~16MB/core):

Both convs reduce to the same "row conv" shape: a stride-1 sum of Q shifted
MXU matmuls over a 2D [rows, lanes] VMEM buffer, with Q = ceil(K/stride)
(phase-GROUPED taps) instead of K per-tap matmuls:

* conv1d (stride s, kernel K): pack s consecutive input samples per output
  row — x_rows[m] = x[m*s - pad_lo : m*s - pad_lo + s] flattened with
  channels to s*cin lanes. Then y[t] = sum_q x_rows[t+q] @ W_q with
  W_q = w[q*s : (q+1)*s] reshaped [s*cin, cout]: Q matmuls of
  [t_tile, s*cin_blk] x [s*cin_blk, cout_blk] per tile (K=25, s=4 -> 7
  matmuls with 512-wide contractions, vs 25 128-wide).

* conv_transpose1d: polyphase on the OUTPUT — output row m holds all s
  phases, y_rows[m] = sum_tau x[m + tau - q_max] @ V_tau with
  V_tau[c, rho*cout + o] = w[pad_lo + rho + (q_max - tau)*s, c, o]: again Q
  shifted matmuls, lanes_out = s*cout_blk, so even cout=64 layers feed the
  MXU 256+ lanes.

Layouts are plain 2D tiles ([rows, lanes], lanes a multiple of 128), so
bf16 runs NATIVELY (sublane packing never crosses a sliced dim — the v1
kernel's [B, R, s, C] scratch put s=4 on the sublane axis, which both
wasted half of every 8-sublane tile and broke Mosaic's bf16 2-packing).
The f32 accumulator lives in scratch and persists across the innermost
cin-block grid steps; the output is written once, on the last visit.

Input time-blocks overlap by the conv halo, which BlockSpec index maps
cannot express, so x stays in ANY/HBM memory space and each grid step DMAs
its (haloed) slice into a double-buffered VMEM scratch via make_async_copy,
started one step ahead (DMA hides behind the Q matmuls).

Shapes hostile to the MXU (min(cin, cout) < MIN_CH, e.g. the waveform
boundary layers) take the XLA path inside the same lowering — documented,
tested, and cheap there anyway: with cout=1 the channel padding to 128
would multiply the layer's FLOPs 128x.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# layers whose thin side is below this take the XLA path
MIN_CH = 32
_INTERPRET = False  # flipped by tests on CPU

# batch-collapse thresholds (max t_out / m_out that collapses; HW-measured
# 2026-08-17 f32 single-layer: conv1d collapse 1.69x vs XLA at t_out=256
# and 0.89->1.01x at t_out=16, but convT collapse LOSES at every size
# (0.84x / 0.99x / 0.50x at m_out 16/64/256 — the stacked halo is a larger
# fraction of rows_b and lanes_out is already s-times wider), and the bf16
# flagship tier-compare confirms: convT collapse at 64 dragged the mixed
# tier 1.05x -> 0.96x. Default: conv1d collapses small-T, convT never.
import os as _os
_COLLAPSE_MAX_CONV = int(_os.environ.get("AUDIOGAN_COLLAPSE_CONV", "256"))
_COLLAPSE_MAX_CONVT = int(_os.environ.get("AUDIOGAN_COLLAPSE_CONVT", "0"))
# Row-tile cap. At the flagship shapes a 512-row tile holds < 1 us of MXU
# work (7 dots of [512,256]@[256,128] ~ 0.7 us at the 172 TF/s roof), so
# per-grid-step overhead dominates — the r3s5 roof hunt sweeps this.
_T_TILE_CAP = int(_os.environ.get("AUDIOGAN_T_TILE_CAP", "512"))


def _vma_sds(shape, dtype, *operands):
    """ShapeDtypeStruct whose vma is the union of the operands' varying
    mesh axes — required to trace pallas_call inside a vma-checked
    shard_map (the cp/tp/multihost step bodies): pallas outputs of
    shard-varying compute are shard-varying. Outside shard_map every
    operand's vma is empty and this is a plain ShapeDtypeStruct."""
    vma = frozenset()
    for o in operands:
        if o is None:
            continue
        v = getattr(getattr(o, "aval", None), "vma", None)
        if v:
            vma |= frozenset(v)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, m: int) -> int:
    return _cdiv(a, m) * m


def _rows_alloc(n_t: int, t_tile: int, q_taps: int) -> int:
    """Input rows to materialize so every tile's 16-aligned haloed DMA
    (see _rowconv_call) stays in bounds."""
    return (n_t - 1) * t_tile + _round_up(t_tile + q_taps - 1, 16)


def _fit_t_tile(t_tile: int, q_taps: int, lanes_in: int, lanes_out: int,
                itemsize: int) -> int:
    """Largest multiple-of-16 tile whose scoped-VMEM footprint (haloed
    double-buffered input + weight block + f32 accumulator + revisited
    output window) fits the 16 MB VMEM with headroom for Mosaic's own
    buffers. Measured OOM without this: collapse-mode convt 16x1024->512
    f32 at t_tile=512 allocated 16.02M (limit 16.00M, 2026-08-17)."""
    budget = 13 * 1024 * 1024
    w_bytes = q_taps * lanes_in * lanes_out * itemsize
    while True:
        rows_tile = _round_up(t_tile + q_taps - 1, 16)
        need = (2 * rows_tile * lanes_in * itemsize + w_bytes
                + t_tile * lanes_out * 4
                + 2 * t_tile * lanes_out * itemsize)
        if need <= budget:
            return t_tile
        if t_tile <= 16:
            # even a 16-row tile busts VMEM (enormous q_taps*lanes weight
            # block): fail loudly instead of OOMing at runtime (ADVICE r2)
            raise ValueError(
                f"pallas conv tile does not fit VMEM: q_taps={q_taps} "
                f"lanes_in={lanes_in} lanes_out={lanes_out} needs "
                f"{need / 2**20:.1f} MiB at t_tile=16 (budget 13 MiB); "
                f"use --kernels xla for this geometry")
        t_tile -= 16


def _same_pads(t_in: int, k: int, s: int) -> tuple[int, int, int]:
    """SAME padding for stride-s conv: t_out = ceil(t_in / s)."""
    t_out = _cdiv(t_in, s)
    total = max((t_out - 1) * s + k - t_in, 0)
    lo = total // 2
    return t_out, lo, total - lo


# ---------------------------------------------------------------------------
# shared row-conv kernel body: Q shifted matmuls + persistent f32 accumulator
# ---------------------------------------------------------------------------

def _apply_act(r, act: str, slope: float):
    """Epilogue activation on the f32 accumulator (also used by the XLA
    tier so both tiers share one definition). Gradient conventions match
    jax.nn: relu' = (x > 0), leaky_relu' at 0 = 1."""
    if act == "relu":
        return jnp.maximum(r, 0.0)
    if act == "leaky_relu":
        return jnp.where(r >= 0, r, r * slope)
    if act == "tanh":
        return jnp.tanh(r)
    assert act == "none", act
    return r


def _rowconv_kernel(x_hbm, w_ref, *rest, q_taps, t_tile, rows_tile,
                    grid_dims, act="none", slope=0.2, has_bias=False):
    if has_bias:
        b_ref, o_ref, xs, acc, sem = rest
    else:
        b_ref, (o_ref, xs, acc, sem) = None, rest
    b, ti, co, ci = (pl.program_id(i) for i in range(4))
    nb, nt, nco, nci = grid_dims
    total = nb * nt * nco * nci
    linear = ((b * nt + ti) * nco + co) * nci + ci
    slot = linear % 2

    # Double-buffered haloed input DMA: step L starts step L+1's copy into
    # the other slot before waiting on its own, hiding HBM latency behind
    # the Q matmuls. The lane dim is never sliced (the ci block is a full
    # middle-dim index), so any dtype's tiling is legal.
    def make_dma(b_, ti_, ci_, slot_):
        src = x_hbm.at[b_, ci_, pl.ds(ti_ * t_tile, rows_tile), :]
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

    @pl.when(ci == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    a = acc[...]
    for q in range(q_taps):                                # static unroll
        a += jnp.dot(xs[slot, pl.ds(q, t_tile), :], w_ref[0, 0, q],
                     preferred_element_type=jnp.float32)
    acc[...] = a

    @pl.when(ci == nci - 1)
    def _():
        r = a if b_ref is None else a + b_ref[0]
        o_ref[0, 0] = _apply_act(r, act, slope).astype(o_ref.dtype)


def _rowconv_call(x_rows, w_taps, *, b, n_t, t_tile, q_taps, n_ci, n_co,
                  lanes_out, out_dtype, flops, bytes_accessed,
                  bias=None, act="none", slope=0.2):
    """x_rows [B, n_ci, rows, lanes_in]; w_taps [n_ci, n_co, Q, lanes_in,
    lanes_out] -> [B, n_co, n_t*t_tile, lanes_out]."""
    # Mosaic requires VMEM slice lengths be sublane-aligned: the DMA'd halo
    # extent is rounded up to 16 rows (bf16 sublane packing) and x_rows
    # carries matching tail padding (_rows_alloc below).
    rows_tile = _round_up(t_tile + q_taps - 1, 16)
    lanes_in = x_rows.shape[-1]
    grid = (b, n_t, n_co, n_ci)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),       # x_rows stays in HBM
        # block dims (n_ci, n_co) lead so the trailing two dims are the
        # full (lanes_in, lanes_out) tile (Mosaic requires the last two
        # block dims be full or (8,128)-divisible)
        pl.BlockSpec((1, 1, q_taps, lanes_in, lanes_out),
                     lambda b_, t_, co_, ci_: (ci_, co_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x_rows, w_taps]
    if bias is not None:
        # epilogue bias: one [lanes_out] f32 row per cout block, added to
        # the accumulator on its final visit (before the activation). The
        # singleton middle dim keeps the block's trailing two dims equal
        # to the array's (Mosaic rejects a (1, lanes) block over an
        # (n_co>1, lanes) array: 1 is neither 8-divisible nor == n_co).
        in_specs.append(pl.BlockSpec((1, 1, lanes_out),
                                     lambda b_, t_, co_, ci_: (co_, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32).reshape(-1, 1, lanes_out))
    return pl.pallas_call(
        functools.partial(_rowconv_kernel, q_taps=q_taps, t_tile=t_tile,
                          rows_tile=rows_tile, grid_dims=grid, act=act,
                          slope=slope, has_bias=bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, t_tile, lanes_out),
                               lambda b_, t_, co_, ci_: (b_, co_, t_, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_vma_sds((b, n_co, n_t * t_tile, lanes_out),
                           out_dtype, x_rows, w_taps, bias),
        scratch_shapes=[
            pltpu.VMEM((2, rows_tile, lanes_in), x_rows.dtype),  # dbl buffer
            pltpu.VMEM((t_tile, lanes_out), jnp.float32),        # accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=(b * n_t * t_tile * lanes_out
                             if act == "tanh" else 0)),
        interpret=_INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# strided conv1d
# ---------------------------------------------------------------------------

def _in_ch_blocks(c: int, s: int, blk_cap: int = 256) -> tuple[int, int]:
    """(c_padded, blk) for a channel dim whose lanes appear as s*c: the
    Mosaic constraint is s*c_padded % 128 == 0, NOT c_padded % 128 — e.g.
    cin=64 at stride 4 needs NO padding (4*64=256 lanes), where rounding
    cin to 128 doubled every DMA byte of the widest-T layer (measured 34%
    kernel slowdown, 2026-08-17)."""
    align = 128 // math.gcd(s, 128)
    c_p = _round_up(c, align)
    if c_p <= blk_cap:
        return c_p, c_p
    c_p = _round_up(c_p, blk_cap)
    return c_p, blk_cap


def _conv1d_pallas(x: jnp.ndarray, w: jnp.ndarray, s: int,
                   pad_lo: int, pad_hi: int, t_out: int,
                   bias=None, act="none", slope=0.2) -> jnp.ndarray:
    b, t_in, cin = x.shape
    k, _, cout = w.shape
    cin_p, cin_blk = _in_ch_blocks(cin, s)
    cout_p = _round_up(cout, 128)
    if cout_p > 256:
        cout_p = _round_up(cout_p, 256)
    q_taps = _cdiv(k, s)
    cout_blk = min(cout_p, 256)
    n_ci, n_co = cin_p // cin_blk, cout_p // cout_blk

    # Small-T layers (deep critic stages: t_out 256/64/16 at batch 64)
    # drown in per-grid-step overhead when each batch element gets its own
    # tiny tile. Batch-collapse instead: stack every element's rows (WITH
    # its q_taps-1 halo) along one row axis — out_stack[b*rows_b + t] =
    # sum_q X[b*rows_b + t + q] @ W_q never crosses a batch boundary
    # because t + q <= rows_b - 1 — so one 512-row tile spans many batch
    # elements and the Q matmuls stay MXU-sized.
    collapse = b > 1 and t_out <= _COLLAPSE_MAX_CONV
    if collapse:
        rows_b = t_out + q_taps - 1             # stacked stride per batch
        r_out = (b - 1) * rows_b + t_out        # last real output row + 1
        t_tile = _fit_t_tile(min(_round_up(r_out, 16), _T_TILE_CAP), q_taps,
                             s * cin_blk, cout_blk, x.dtype.itemsize)
        n_t = _cdiv(r_out, t_tile)
        rows_needed = _rows_alloc(n_t, t_tile, q_taps)
        back = rows_b * s - pad_lo - t_in       # may undershoot: trim
        x_sh = jnp.pad(x, ((0, 0), (pad_lo, max(back, 0)),
                           (0, cin_p - cin)))[:, :rows_b * s]
        xr = x_sh.reshape(b * rows_b, s, n_ci, cin_blk)
        xr = jnp.pad(xr, ((0, rows_needed - b * rows_b), (0, 0), (0, 0),
                          (0, 0)))
        xr = xr.transpose(2, 0, 1, 3)           # free when n_ci == 1
        x_rows = xr.reshape(1, n_ci, rows_needed, s * cin_blk)
        kb, kt = 1, n_t
    else:
        t_tile = _fit_t_tile(min(_round_up(t_out, 16), _T_TILE_CAP), q_taps,
                             s * cin_blk, cout_blk, x.dtype.itemsize)
        n_t = _cdiv(t_out, t_tile)

        # x rows: row m = x_sh[m*s : m*s + s] (s samples x cin channels),
        # where x_sh is x with pad_lo zeros in front; lanes ordered
        # (ci-block, s, c).
        rows_needed = _rows_alloc(n_t, t_tile, q_taps)
        pad_back = rows_needed * s - pad_lo - t_in
        x_sh = jnp.pad(x, ((0, 0), (pad_lo, pad_back), (0, cin_p - cin)))
        xr = x_sh.reshape(b, rows_needed, s, n_ci, cin_blk)
        xr = xr.transpose(0, 3, 1, 2, 4)            # free when n_ci == 1
        x_rows = xr.reshape(b, n_ci, rows_needed, s * cin_blk)
        kb, kt = b, n_t

    # weights: W_q = w[q*s : (q+1)*s] with rows ordered (ci-block, s, c),
    # laid out [n_ci, n_co, Q, lanes_in, lanes_out] (block dims lead)
    wp = jnp.pad(w, ((0, q_taps * s - k), (0, cin_p - cin),
                     (0, cout_p - cout)))
    wt = wp.reshape(q_taps, s, n_ci, cin_blk, n_co, cout_blk)
    wt = wt.transpose(2, 4, 0, 1, 3, 5)
    w_taps = wt.reshape(n_ci, n_co, q_taps, s * cin_blk, cout_blk)

    bias_lanes = (None if bias is None else
                  jnp.pad(bias, (0, cout_p - cout)).reshape(n_co, cout_blk))
    out = _rowconv_call(
        x_rows, w_taps, b=kb, n_t=kt, t_tile=t_tile, q_taps=q_taps,
        n_ci=n_ci, n_co=n_co, lanes_out=cout_blk, out_dtype=x.dtype,
        bias=bias_lanes, act=act, slope=slope,
        flops=2 * b * t_out * k * cin * cout,
        # input tiles are re-DMA'd once per n_co grid step (grid (b, n_t,
        # n_co, n_ci)); cin_p already spans all n_ci blocks
        bytes_accessed=(kb * rows_needed * s * cin_p * n_co
                        + q_taps * s * cin_p * cout_p
                        + b * t_out * cout_p) * x.dtype.itemsize)
    if collapse:
        out = out[0].transpose(1, 0, 2)         # [n_t*t_tile, n_co, blk]
        out = out.reshape(n_t * t_tile, n_co * cout_blk)
        out = jnp.pad(out, ((0, max(b * rows_b - out.shape[0], 0)),
                            (0, 0)))[:b * rows_b]
        return out.reshape(b, rows_b, n_co * cout_blk)[:, :t_out, :cout]
    out = out.transpose(0, 2, 1, 3)                 # free when n_co == 1
    out = out.reshape(b, n_t * t_tile, n_co * cout_blk)
    return out[:, :t_out, :cout]


# ---------------------------------------------------------------------------
# conv_transpose1d (fractionally-strided conv, output-polyphase kernel)
# ---------------------------------------------------------------------------

def _convt_phase_range(k: int, s: int, pad_lo: int) -> tuple[int, int]:
    """(q_min, q_taps) for y[m*s+rho] = sum_q x[m+q] @ w[pad_lo-rho+q*s]."""
    q_min = -(pad_lo // s)
    q_max = (k + s - 2 - pad_lo) // s
    return q_min, q_max - q_min + 1


def _convt_phase_taps(w, s: int, pad_lo: int):
    """Polyphase tap bank V[tau, rho, c, o] = w[pad_lo - rho +
    (q_min+tau)*s, c, o], zeroed where the tap index leaves [0, k); static
    gather at trace time. ONE home for the correctness-critical index
    formula shared by the Pallas and XLA conv_transpose lowerings (the
    equivalence tests compare exactly these two tiers)."""
    k = w.shape[0]
    q_min, q_taps = _convt_phase_range(k, s, pad_lo)
    tau = np.arange(q_taps)[:, None]
    rho = np.arange(s)[None, :]
    j_idx = pad_lo - rho + (q_min + tau) * s            # [Q, s]
    valid = (j_idx >= 0) & (j_idx < k)
    v = jnp.where(jnp.asarray(valid)[:, :, None, None],
                  w[np.clip(j_idx, 0, k - 1)], 0)       # [Q, s, ci, co]
    return v, q_min, q_taps


def _convt_pallas(x, w, s, pad_lo, out_len, bias=None, act="none",
                  slope=0.2):
    b, t_in, cin = x.shape
    k, _, cout = w.shape
    assert out_len % s == 0, "conv_transpose output must be stride-aligned"
    m_out = out_len // s                                # output phase-rows
    cin_p = _round_up(cin, 128)                 # lanes_in = cin_blk alone
    if cin_p > 256:
        cin_p = _round_up(cin_p, 256)
    cin_blk = min(cin_p, 256)
    # cout appears as s*cout lanes => only s*cout_p must be 128-aligned
    # (see _in_ch_blocks): cout=64 at s=4 stays unpadded
    cout_p, cout_blk = _in_ch_blocks(
        cout, s, blk_cap=max(1024 // s // 128, 1) * 128)
    n_ci, n_co = cin_p // cin_blk, cout_p // cout_blk
    lanes_out = s * cout_blk

    # y[m, rho] = sum_q x[m + q] w[pad_lo - rho + q*s]  (cross-correlation
    # with the input-dilated signal, phases split on the output). With
    # q in [q_min, q_max] and tau = q - q_min:
    #   y_rows[m] = sum_tau x_pad[m + tau] @ V_tau,
    # where x_pad has -q_min zeros in front.
    q_min, q_taps = _convt_phase_range(k, s, pad_lo)

    # batch-collapse small-m layers (see _conv1d_pallas): stacking each
    # element's rows WITH their halo keeps every tap read inside its own
    # batch's span, so one 512-row tile covers many elements
    collapse = b > 1 and m_out <= _COLLAPSE_MAX_CONVT
    if collapse:
        rows_b = m_out + q_taps - 1
        r_out = (b - 1) * rows_b + m_out
        t_tile = _fit_t_tile(min(_round_up(r_out, 16), _T_TILE_CAP), q_taps,
                             cin_blk, lanes_out, x.dtype.itemsize)
        n_t = _cdiv(r_out, t_tile)
        rows_needed = _rows_alloc(n_t, t_tile, q_taps)
        back = rows_b + q_min - t_in
        if back < 0:
            # trailing input rows the first out_len outputs never read
            x, t_in, back = x[:, :t_in + back], t_in + back, 0
        x_pad = jnp.pad(x, ((0, 0), (-q_min, back), (0, cin_p - cin)))
        xr = x_pad.reshape(b * rows_b, n_ci, cin_blk)
        xr = jnp.pad(xr, ((0, rows_needed - b * rows_b), (0, 0), (0, 0)))
        x_rows = xr.transpose(1, 0, 2).reshape(1, n_ci, rows_needed,
                                               cin_blk)
        kb, kt = 1, n_t
    else:
        t_tile = _fit_t_tile(min(_round_up(m_out, 16), _T_TILE_CAP), q_taps,
                             cin_blk, lanes_out, x.dtype.itemsize)
        n_t = _cdiv(m_out, t_tile)
        rows_needed = _rows_alloc(n_t, t_tile, q_taps)
        pad_back = rows_needed + q_min - t_in
        if pad_back < 0:
            # trailing input rows the first out_len outputs never read
            x, t_in, pad_back = x[:, :t_in + pad_back], t_in + pad_back, 0
        x_pad = jnp.pad(x, ((0, 0), (-q_min, pad_back), (0, cin_p - cin)))
        xr = x_pad.reshape(b, rows_needed, n_ci, cin_blk)
        x_rows = xr.transpose(0, 2, 1, 3)           # free when n_ci == 1
        kb, kt = b, n_t

    wp = jnp.pad(w, ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    v, _, _ = _convt_phase_taps(wp, s, pad_lo)          # [Q, s, cin_p, cout_p]
    v = v.transpose(0, 2, 1, 3)                         # [Q, cin_p, s, cout_p]
    v = v.reshape(q_taps, n_ci, cin_blk, s, n_co, cout_blk)
    # lay out [n_ci, n_co, Q, cin_blk, s*cout_blk] (block dims lead)
    v = v.transpose(1, 4, 0, 2, 3, 5)
    w_taps = v.reshape(n_ci, n_co, q_taps, cin_blk, lanes_out)

    if bias is None:
        bias_lanes = None
    else:
        # lanes are (rho, cout_blk)-ordered: tile the per-cout bias over
        # the s output phases of each row
        bb = jnp.pad(bias, (0, cout_p - cout)).reshape(n_co, 1, cout_blk)
        bias_lanes = jnp.broadcast_to(bb, (n_co, s, cout_blk)).reshape(
            n_co, lanes_out)
    out = _rowconv_call(
        x_rows, w_taps, b=kb, n_t=kt, t_tile=t_tile, q_taps=q_taps,
        n_ci=n_ci, n_co=n_co, lanes_out=lanes_out, out_dtype=x.dtype,
        bias=bias_lanes, act=act, slope=slope,
        flops=2 * b * m_out * k * cin * cout,
        bytes_accessed=(kb * rows_needed * cin_p * n_co
                        + q_taps * s * cin_p * cout_p
                        + b * out_len * cout_p) * x.dtype.itemsize)
    if collapse:
        nt_rows = n_t * t_tile
        out = out.reshape(n_co, nt_rows, s, cout_blk)
        out = out.transpose(1, 2, 0, 3).reshape(nt_rows, s,
                                                n_co * cout_blk)
        out = jnp.pad(out, ((0, max(b * rows_b - nt_rows, 0)), (0, 0),
                            (0, 0)))[:b * rows_b]
        out = out.reshape(b, rows_b * s, n_co * cout_blk)
        return out[:, :out_len, :cout]
    out = out.reshape(b, n_co, n_t * t_tile, s, cout_blk)
    out = out.transpose(0, 2, 3, 1, 4)                  # free when n_co == 1
    out = out.reshape(b, n_t * t_tile * s, n_co * cout_blk)
    return out[:, :out_len, :cout]


# ---------------------------------------------------------------------------
# lowerings used by kernels.primitives + public API
# ---------------------------------------------------------------------------

def _convt_polyphase_xla(x, w, s, pad_lo, out_len):
    """conv_transpose as ONE stride-1 XLA conv over output phases — the
    lhs_dilation-free formulation (same math as _convt_pallas's V gather):

        y[m*s + rho] = sum_q x[m + q] @ w[pad_lo - rho + q*s]

    Two reasons this replaces the lax lhs_dilation form everywhere:
    1. CORRECTNESS: the axon TPU platform MISCOMPILES lhs_dilation convs for
       some geometries (k=2s+1 with pad_lo=s, e.g. k=9/s=4/pad=(4,4):
       max|err| ~ 1e1 on O(1) data, verified on-chip 2026-08-16 vs CPU and
       a float64 oracle; k=25/s=4/pad=(12,12) happens to be fine). Pinned
       by tests/ops/test_convt_polyphase.py + tests_tpu/run_pallas_tpu.py.
    2. SPEED: a dilated conv visits s-1 zeros per real sample; this form is
       one dense [Q, cin, s*cout] conv — the MXU-native shape, no wasted
       positions.
    """
    b, t_in, cin = x.shape
    k, _, cout = w.shape
    m_out = _cdiv(out_len, s)
    v, q_min, q_taps = _convt_phase_taps(w, s, pad_lo)          # [Q,s,ci,co]
    v = v.transpose(0, 2, 1, 3).reshape(q_taps, cin, s * cout)

    out = lax.conv_general_dilated(
        x, v, window_strides=(1,),
        padding=[(-q_min, m_out + (q_min + q_taps - 1) - t_in)],
        dimension_numbers=("NWC", "WIO", "NWC"))                # [B,m_out,s*co]
    return out.reshape(b, m_out * s, cout)[:, :out_len]


def _auto_backend_ok() -> bool:
    """Mosaic only lowers on TPU: impl="auto" silently falls back to the
    XLA tier on CPU/GPU (ADVICE r2) unless tests force interpreter mode."""
    return _INTERPRET or jax.default_backend() == "tpu"


# Generation-regime batches: the Pallas row tiling was tuned for the
# train regime (b=64); at large batches XLA's conv lowering saturates the
# MXU and wins every flagship layer — sampler A/Bs (2026-08-17, 3-4
# interleaved rounds each, audio-sec/sec): b=512 auto 0.80-0.91x xla,
# b=1024 0.81-0.88x, b=2048 0.77-0.78x, b=4096 0.78x (uniform pallas
# 0.61-0.66x). auto therefore routes b >= this to xla.
_AUTO_XLA_BATCH = 512

# auto-router bands, lifted to module globals so step-level ablations can
# override them per-variant (scripts/step_ab.py gvar: syntax).
#
# Re-derived at STEP level under the staged no-remat harness (r3s6 band
# ablations, 6 interleaved rounds x 10 steps, 2026-08-18): the convt
# band carries a +9.1% step-level win (ablating it: 7.94 vs base 8.73
# steps/s), while the old conv1d band (128<=t_out<=512, from the
# transfer-confounded r3s1 microbenches) COST 1.6% (ablating it: 8.88).
# conv_roof agrees: pallas conv1d fwd trails xla 1.25-1.47x at every
# flagship geometry. The conv1d band is therefore EMPTY by default
# (LO > HI); the globals remain for step-level A/Bs.
_AUTO_CONV_BAND_LO = 1          # conv1d fwd routes to pallas when
_AUTO_CONV_BAND_HI = 0          #   _AUTO_CONV_BAND_LO <= t_out <= _HI
_AUTO_CONVT_MIN = 64            # convt1d routes to pallas when m_out >= this


def _auto_conv1d_impl(b: int, t_out: int, cin: int, cout: int,
                      stride: int = 4) -> str:
    """Per-geometry tier choice for impl="auto". Resolved at trace time
    inside the lowering, so every AD-generated conv picks its own best
    tier for ITS geometry. The conv1d band is EMPTY by default: the r3s6
    step-level ablation (staged harness) showed the old 128<=t_out<=512
    band cost 1.6% at the flagship, and conv_roof measured pallas conv1d
    fwd 1.25-1.47x slower than xla at every flagship geometry (the old
    band came from the transfer-confounded r3s1 microbenches). Globals
    _AUTO_CONV_BAND_LO/_HI remain overridable for step-level A/Bs.
    Music strides (7/7/5/5/3) measured no reliable pallas win either, so
    auto keeps XLA off-stride-4 too."""
    if not _auto_backend_ok() or stride != 4 or b >= _AUTO_XLA_BATCH:
        return "xla"
    return ("pallas" if (b > 1 and
                         _AUTO_CONV_BAND_LO <= t_out <= _AUTO_CONV_BAND_HI)
            else "xla")


def _auto_convt1d_impl(b: int, m_out: int, cin: int, cout: int,
                       stride: int = 4) -> str:
    """convT tier choice for impl="auto". The m_out >= 64 band carries a
    +9.1% STEP-level win at the flagship (r3s6 band ablation: routing
    convt to xla drops 8.73 -> 7.94 steps/s, staged harness) even though
    isolated chained microbenches (conv_roof) show pallas convt fwd
    1.04-1.13x slower — the win lives in the AD-generated convt
    geometries inside the GP double-backprop and in step-context
    scheduling, which only step-level ablation measures. m_out=16 was a
    wash-to-loss (per-call overhead on a 16-row grid). Stride-4 band;
    music strides measured 0.95-1.30 fwd with dx/dw up to 1.99
    (m_out=11760) — XLA off-stride-4."""
    if not _auto_backend_ok() or stride != 4 or b >= _AUTO_XLA_BATCH:
        return "xla"
    return "pallas" if m_out >= _AUTO_CONVT_MIN else "xla"


def conv1d_lowered(x, w, stride, pad_lo, pad_hi, impl="pallas"):
    """Lowering body for the audiogan_conv1d primitive (pallas, XLA, or
    per-geometry "auto")."""
    k, cin, cout = w.shape
    t_in = x.shape[1]
    t_out = (t_in + pad_lo + pad_hi - k) // stride + 1
    if impl == "auto":
        impl = _auto_conv1d_impl(x.shape[0], t_out, cin, cout,
                                 stride)
    if impl != "pallas" or min(cin, cout) < MIN_CH:
        return lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding=[(pad_lo, pad_hi)],
            dimension_numbers=("NWC", "WIO", "NWC"))
    return _conv1d_pallas(x, w, stride, pad_lo, pad_hi, t_out)


def convt1d_lowered(x, w, stride, pad_lo, out_len, impl="pallas"):
    """Lowering body for the audiogan_convt1d primitive (pallas or XLA).

    NEVER emits lhs_dilation (miscompiled on this TPU platform — see
    _convt_polyphase_xla): the XLA tier is the polyphase-phases conv.
    """
    k, cin, cout = w.shape
    if impl == "auto":
        impl = _auto_convt1d_impl(x.shape[0], _cdiv(out_len, stride),
                                  cin, cout, stride)
    if (impl != "pallas" or min(cin, cout) < MIN_CH
            or out_len % stride != 0):
        return _convt_polyphase_xla(x, w, stride, pad_lo, out_len)
    return _convt_pallas(x, w, stride, pad_lo, out_len)


# ---------------------------------------------------------------------------
# fused bias+activation lowerings (audiogan_conv1d_ba / convt1d_ba)
# ---------------------------------------------------------------------------

def conv1d_ba_lowered(x, w, bias, stride, pad_lo, pad_hi, act, slope, impl):
    """act(conv1d(x, w) + bias) with the epilogue fused into the Pallas
    kernel's final accumulator visit (VERDICT r2 #1a: removes one full
    activation HBM round-trip per layer). The XLA tier composes the same
    math from fusable XLA ops."""
    k, cin, cout = w.shape
    t_out = (x.shape[1] + pad_lo + pad_hi - k) // stride + 1
    if impl == "auto":
        impl = _auto_conv1d_impl(x.shape[0], t_out, cin, cout,
                                 stride)
    if impl != "pallas" or min(cin, cout) < MIN_CH:
        y = lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding=[(pad_lo, pad_hi)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return _apply_act(y + bias.astype(y.dtype), act, slope)
    return _conv1d_pallas(x, w, stride, pad_lo, pad_hi, t_out,
                          bias=bias, act=act, slope=slope)


def convt1d_ba_lowered(x, w, bias, stride, pad_lo, out_len, act, slope,
                       impl):
    """act(conv_transpose1d(x, w) + bias), fused epilogue (see
    conv1d_ba_lowered)."""
    k, cin, cout = w.shape
    if impl == "auto":
        impl = _auto_convt1d_impl(x.shape[0], _cdiv(out_len, stride),
                                  cin, cout, stride)
    if (impl != "pallas" or min(cin, cout) < MIN_CH
            or out_len % stride != 0):
        y = _convt_polyphase_xla(x, w, stride, pad_lo, out_len)
        return _apply_act(y + bias.astype(y.dtype), act, slope)
    return _convt_pallas(x, w, stride, pad_lo, out_len,
                         bias=bias, act=act, slope=slope)


# ---------------------------------------------------------------------------
# weight-grad lowerings (audiogan_conv1d_wgrad / convt1d_wgrad)
# ---------------------------------------------------------------------------

# There is deliberately NO Pallas weight-grad kernel (cut round 4, was
# VERDICT r2 #1b): measured 2026-08-17 (scripts/kernel_bench.py --parts
# dw, bf16) the stacked-row-matmul kernels LOST to the XLA forms at every
# trained geometry (1.06-1.28 flagship, 1.05-1.99 music), and round 4
# showed the real lever is the XLA contraction FORM (einsum vs single
# conv, train.wgrad_form — +2.5% flagship / +25.9% music). Every tier,
# including uniform --kernels pallas, routes wgrad to the XLA form below;
# code + measured reasons archived in attic/NOTES.md (git efd6029).

_WGRAD_FORM_DEFAULT = _os.environ.get("AUDIOGAN_WGRAD_FORM", "einsum")
_WGRAD_FORM = _WGRAD_FORM_DEFAULT
# XLA-tier wgrad contraction form: "einsum" = the phase-grouped einsum
# stack below (requires a physical (b,rows,s*cin) lane relayout — ~4 ms
# of the flagship step's reshape bucket, profile r3s8); "conv" = a single
# conv_general_dilated with batch=channels / feature=batch / rhs_dilation=
# stride dimension numbers — no relayout, one contraction, and it uses
# rhs_dilation only (the platform's lhs_dilation miscompile does not
# apply; value-checked on HW by scripts/wgrad_form_check.py).
# The env var seeds the process default; config (TrainCfg.wgrad_form) sets
# it per-run via set_wgrad_form() at step-build time. The pure forms
# (_*_wgrad_einsum / _*_wgrad_conv) stay directly addressable so tests and
# the HW witness can pin one against the other regardless of this global.


def set_wgrad_form(form: str) -> None:
    """Select the XLA-tier wgrad contraction form ("einsum" | "conv").

    Called by the step builders with TrainCfg.wgrad_form; "" RESETS to
    the process default (env AUDIOGAN_WGRAD_FORM, else "einsum") — it
    must not inherit whatever a previous step build in the same process
    set, or bench --preset all would silently bench resample_22k with
    the flagship's "conv" form (its own A/B measured einsum better).
    Affects tracing only — call before jit/lowering."""
    global _WGRAD_FORM
    if not form:
        _WGRAD_FORM = _WGRAD_FORM_DEFAULT
        return
    if form not in ("einsum", "conv"):
        raise ValueError(f"wgrad_form={form!r} not in einsum|conv")
    _WGRAD_FORM = form


def _conv1d_wgrad_conv(x, ct, s, pad_lo, k):
    """dW[j,c,o] = sum_{b,t} x_pad[b, j + t*s, c] * ct[b,t,o] as ONE
    conv_general_dilated: lhs=x (roles C=b, W=time, N=cin), rhs=ct
    (roles I=b, W=t_out, O=cout), window_stride=1, rhs_dilation=s,
    out spec WNC -> [k, cin, cout]. Accumulates f32."""
    b, t_in, cin = x.shape
    t_out = ct.shape[1]
    pad_hi_eff = (t_out - 1) * s + k - t_in - pad_lo
    return lax.conv_general_dilated(
        x, ct, window_strides=(1,), padding=((pad_lo, pad_hi_eff),),
        rhs_dilation=(s,), dimension_numbers=("CWN", "IWO", "WNC"),
        preferred_element_type=jnp.float32)


def _convt1d_wgrad_conv(x, ct, s, pad_lo, out_len, k):
    """dW[j,c,o] = sum_{b,t} x[b,t,c] * ct[b, t*s + pad_lo - j, o] as ONE
    conv_general_dilated over the REVERSED tap axis: lhs=ct (roles C=b,
    W=out_len, N=cout), rhs=x (roles I=b, W=t_in, O=cin),
    rhs_dilation=s, out spec WCN -> [k, cin, cout], then flip taps.
    Handles aligned and non-aligned out_len identically."""
    b, t_in, cin = x.shape
    pad_conv_lo = k - 1 - pad_lo
    pad_conv_hi = (t_in - 1) * s + 1 - out_len + pad_lo
    dwrev = lax.conv_general_dilated(
        ct, x, window_strides=(1,), padding=((pad_conv_lo, pad_conv_hi),),
        rhs_dilation=(s,), dimension_numbers=("CWN", "IWO", "WCN"),
        preferred_element_type=jnp.float32)
    return dwrev[::-1]


def _conv1d_wgrad_xla(x, ct, s, pad_lo, k):
    """XLA-tier conv1d wgrad: thin _WGRAD_FORM dispatcher (ADVICE r3)."""
    if _WGRAD_FORM == "conv":
        return _conv1d_wgrad_conv(x, ct, s, pad_lo, k)
    return _conv1d_wgrad_einsum(x, ct, s, pad_lo, k)


def _convt1d_wgrad_xla(x, ct, s, pad_lo, out_len, k):
    """XLA-tier convT wgrad: thin _WGRAD_FORM dispatcher (ADVICE r3)."""
    if _WGRAD_FORM == "conv":
        return _convt1d_wgrad_conv(x, ct, s, pad_lo, out_len, k)
    return _convt1d_wgrad_einsum(x, ct, s, pad_lo, out_len, k)


def _conv1d_wgrad_einsum(x, ct, s, pad_lo, k):
    """Phase-grouped einsum stack (the original transpose_w body):
    Q = ceil(K/s) einsums with s*cin-wide contractions."""
    b, t_in, cin = x.shape
    t_out = ct.shape[1]
    cout = ct.shape[-1]
    q_taps = _cdiv(k, s)
    rows = t_out + q_taps - 1
    back = rows * s - pad_lo - t_in
    x_sh = jnp.pad(x, ((0, 0), (pad_lo, max(back, 0)),
                       (0, 0)))[:, :rows * s]
    x_rows = x_sh.reshape(b, rows, s * cin)
    dwq = [jnp.einsum("btl,bto->lo",
                      lax.slice_in_dim(x_rows, q, q + t_out, axis=1), ct,
                      preferred_element_type=jnp.float32)
           for q in range(q_taps)]
    return jnp.stack(dwq).reshape(q_taps * s, cin, cout)[:k]


def _convt1d_wgrad_einsum(x, ct, s, pad_lo, out_len, k):
    """Phase-grouped einsum stack for the convT wgrad (tap-phase
    regrouping; the aligned path packs ct into (b, m_out, s*cout) rows)."""
    b, t_in, cin = x.shape
    cout = ct.shape[-1]
    if out_len % s == 0:
        m_out = out_len // s
        q_min, q_taps = _convt_phase_range(k, s, pad_lo)
        rows = m_out + q_taps - 1
        pad_back = rows + q_min - t_in
        if pad_back < 0:
            x, t_in, pad_back = x[:, :t_in + pad_back], t_in + pad_back, 0
        x_pad = jnp.pad(x, ((0, 0), (-q_min, pad_back), (0, 0)))
        ct_rows = ct.reshape(b, m_out, s * cout)
        dvq = [jnp.einsum("btc,btl->cl",
                          lax.slice_in_dim(x_pad, tau, tau + m_out, axis=1),
                          ct_rows, preferred_element_type=jnp.float32)
               for tau in range(q_taps)]
        dv = jnp.stack(dvq).reshape(q_taps, cin, s, cout)
        j = np.arange(k)
        rho_j = (pad_lo - j) % s
        tau_j = (j - pad_lo + rho_j) // s - q_min
        return dv[tau_j, :, rho_j, :]
    # rare non-aligned path: explicit input dilation.
    # Forward: y[n] = sum_j xd[n + j - pad_lo] w[j], so
    #   dw[j]  = sum_m xd[m] ct[m + pad_lo - j]
    # (note the MINUS j: slicing ct at +j computes dw[2*pad_lo - j] — a tap
    # reversal that broke 2nd-order CP grads once).
    xd = jnp.zeros((x.shape[0], (t_in - 1) * s + 1, cin),
                   x.dtype).at[:, ::s].set(x)
    xd_len = xd.shape[1]
    front = max(k - 1 - pad_lo, 0)
    ct_pad = jnp.pad(ct, ((0, 0), (front, xd_len + k), (0, 0)))
    dws = []
    for j in range(k):
        start = front + pad_lo - j
        seg = lax.slice_in_dim(ct_pad, start, start + xd_len, axis=1)
        dws.append(jnp.einsum("btc,bto->co", xd, seg,
                              preferred_element_type=jnp.float32))
    return jnp.stack(dws)


def conv1d_wgrad_lowered(x, ct, stride, pad_lo, pad_hi, k, impl):
    """dW of conv1d w.r.t. its kernel: [B,T,Cin] x [B,T',Cout] ->
    [K,Cin,Cout] (x.dtype) via the XLA form selected by train.wgrad_form
    (einsum stack | single conv; no Pallas tier — cut r4, note above)."""
    del impl  # every tier uses the XLA form (see note above)
    return _conv1d_wgrad_xla(x, ct, stride, pad_lo, k).astype(x.dtype)


def convt1d_wgrad_lowered(x, ct, stride, pad_lo, out_len, k, impl):
    """dW of conv_transpose1d w.r.t. its kernel -> [K,Cin,Cout]."""
    del impl  # every tier uses the XLA form (see note above)
    return _convt1d_wgrad_xla(x, ct, stride, pad_lo, out_len, k).astype(
        x.dtype)


def _same_pads_public(t_in, k, stride, padding):
    if padding == "SAME":
        return _same_pads(t_in, k, stride)
    lo, hi = padding
    t_out = (t_in + lo + hi - k) // stride + 1
    return t_out, lo, hi


def conv1d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: Any = "SAME", impl: str = "pallas") -> jnp.ndarray:
    """Strided cross-correlation [B,T,Cin] x [K,Cin,Cout] -> [B,T',Cout].

    Differentiable to arbitrary order in fwd and rev mode (primitive with
    bilinear jvp + transpose rules, SURVEY R2). impl="xla" uses the pure-XLA
    lowering of the SAME primitive, so its gradients also route through our
    transpose rules (never through lax's lhs_dilation transpose — see
    _convt_polyphase_xla for why that matters on this platform).
    """
    from audiogan_tpu.kernels.primitives import conv1d_prim
    _, lo, hi = _same_pads_public(x.shape[1], w.shape[0], stride, padding)
    return conv1d_prim(x, w, stride=stride, pad_lo=lo, pad_hi=hi, impl=impl)


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                     pad_lo: int | None = None,
                     out_len: int | None = None,
                     impl: str = "pallas") -> jnp.ndarray:
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
    return convt1d_prim(x, w, stride=stride, pad_lo=pad_lo, out_len=out_len,
                        impl=impl)


def conv1d_ba(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
              stride: int = 1, padding: Any = "SAME", act: str = "none",
              slope: float = 0.2, impl: str = "pallas") -> jnp.ndarray:
    """Fused act(conv1d(x, w) + b) — the layer epilogue (bias + LeakyReLU/
    ReLU/tanh) rides the conv kernel's final accumulator write instead of
    round-tripping the activation through HBM. Arbitrary-order
    differentiable: the JVP rule (kernels/primitives.py) rebuilds the
    tangent from the bilinear conv primitives, recovering the activation
    derivative from the OUTPUT (leaky_relu' = where(y>=0, 1, slope);
    tanh' = 1 - y^2), so no pre-activation residual is stored."""
    from audiogan_tpu.kernels.primitives import conv1d_ba_prim
    _, lo, hi = _same_pads_public(x.shape[1], w.shape[0], stride, padding)
    return conv1d_ba_prim(x, w, b, stride=stride, pad_lo=lo, pad_hi=hi,
                          act=act, slope=slope, impl=impl)


def conv_transpose1d_ba(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        stride: int, pad_lo: int | None = None,
                        out_len: int | None = None, act: str = "none",
                        slope: float = 0.2, impl: str = "pallas"
                        ) -> jnp.ndarray:
    """Fused act(conv_transpose1d(x, w) + b) — see conv1d_ba."""
    from audiogan_tpu.kernels.primitives import convt1d_ba_prim
    k = w.shape[0]
    if pad_lo is None:
        pad_lo = (k - 1) // 2
    if out_len is None:
        out_len = x.shape[1] * stride
    return convt1d_ba_prim(x, w, b, stride=stride, pad_lo=pad_lo,
                           out_len=out_len, act=act, slope=slope, impl=impl)
