"""Shuffled-input conv lowerings (VERDICT r3 #1: fuse phase shuffle into
the consuming conv).

The phase shuffle (ops/phase_shuffle.py, SURVEY C10) is a per-example time
shift z[b, i] = xp[b, i + off_b] of the reflect-padded activation xp.  The
select-form default materializes z with a (2·rad+1)x read amplification
before EVERY consuming critic conv — the r3s8 profile attributes ~13% of
the flagship step to it (shuffle-off diagnostic 11.83 vs 10.28 steps/s).

This module fuses the window take into the conv itself using a WEIGHT
identity instead of data movement:

    conv(z, w)[t] = sum_j xp[t*s - pad_lo + j + off] * w[j]
                  = sum_j' xp2[t*s + j'] * W_off[j'],   W_off[j'] = w[j'-off]

where xp2 is xp with the conv's own zero pads and xp is PRE-MASKED to zero
outside [off, off + T) (the caller fuses that mask into the reflect pad —
one elementwise pass).  The per-example shift becomes a choice among
V = 2·rad+1 statically shifted copies of the kernel; on the Pallas tier
that choice is a scalar-prefetched block index on the weight operand —
which the pipeline re-streams every grid step anyway — so the shuffle
costs ZERO extra data movement in the fused forward.  The transpose w.r.t.
xp has the same structure (convT with the shift-selected transposed
kernel), so the x-gradient chain — the dominant shuffle cost through the
WGAN-GP double backprop — is also select-free.  Only the weight-gradient
keeps a window-select (dw = wgrad(z, ct) — the slot-scatter dual of the
weight shift has no cheap contraction form), bounded to one select per
layer per backward pass.

Layout contract: xp [B, T + 2·rad, Cin] (reflect-padded + masked), offs
[B] int32 in [0, 2·rad] (off = rad - shift), w [K, Cin, Cout] raw.
Geometry params (stride, pad_lo, pad_hi) are the CONSUMER conv's pads for
the unpadded length T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from audiogan_tpu.kernels.conv import (_apply_act, _same_pads,
                                       conv1d_ba_lowered, conv1d_lowered,
                                       convt1d_lowered)


def window_select(xp: jnp.ndarray, offs: jnp.ndarray, t: int,
                  rad: int) -> jnp.ndarray:
    """[B, T+2rad, C] -> [B, t, C]: z[b, i] = xp[b, i + offs_b].

    The gather-free select-over-static-slices form (exactly one term is
    selected per example; the rest add 0.0) — same construction as
    ops/phase_shuffle._apply_shifts, duplicated here to keep the kernel
    layer import-clean of the op layer."""
    out = None
    for j in range(2 * rad + 1):
        sel = (offs == j)[:, None, None]
        seg = lax.slice_in_dim(xp, j, j + t, axis=1)
        term = jnp.where(sel, seg, jnp.zeros((), seg.dtype))
        out = term if out is None else out + term
    return out


def window_place(u: jnp.ndarray, offs: jnp.ndarray, rad: int) -> jnp.ndarray:
    """Transpose of window_select: [B, t, C] -> [B, t+2rad, C] placing u at
    per-example offset offs_b (zeros elsewhere)."""
    out = None
    for j in range(2 * rad + 1):
        sel = (offs == j)[:, None, None]
        seg = jnp.pad(u, ((0, 0), (j, 2 * rad - j), (0, 0)))
        term = jnp.where(sel, seg, jnp.zeros((), seg.dtype))
        out = term if out is None else out + term
    return out


# mask_reflect_pad's BACKWARD is the round-5 glue lever for fused shuffle
# sites: AD transposes the reflect pad (a concat of flipped edge slices)
# into split + two FULL-WIDTH zero-padded add_any terms — at music's
# t=25200 site-1 that is 2 × 3.3 GB of jaxpr-level accumulation writes per
# step (scripts/glue_census.py, 2026-08-20). With _MRPAD_PRIM=1 the op is
# a linear primitive pair whose hand transpose folds the rad-wide edges by
# CONCAT (one full-width write); the pair re-enters itself under
# transposition so the GP double-backprop composes at any order. Values
# and grads are bit-equal (disjoint rows sum the same terms) — pinned by
# tests/kernels/test_sconv.py. Module-global for step_ab gvar: A/Bs.
_MRPAD_PRIM = 0


def _mrpad_fwd(y: jnp.ndarray, offs: jnp.ndarray, rad: int) -> jnp.ndarray:
    b, t, c = y.shape
    xp = jnp.pad(y, ((0, 0), (rad, rad), (0, 0)), mode="reflect")
    pos = jnp.arange(t + 2 * rad, dtype=jnp.int32)[None, :, None]
    o = offs[:, None, None]
    live = (pos >= o) & (pos < o + t)
    return jnp.where(live, xp, jnp.zeros((), xp.dtype))


def _mrpad_t(ct: jnp.ndarray, offs: jnp.ndarray, rad: int) -> jnp.ndarray:
    """dy = Rᵀ(mask·ct): mask, then fold the reflect edges back at rad
    width — dy[1+e] += v[rad-1-e], dy[t-2-e] += v[rad+t+e] — assembled by
    concat so the whole adjoint is ONE full-width write."""
    b, tp, c = ct.shape
    t = tp - 2 * rad
    assert t >= 2 * rad + 2, (t, rad)  # disjoint fold rows (all presets)
    pos = jnp.arange(tp, dtype=jnp.int32)[None, :, None]
    o = offs[:, None, None]
    live = (pos >= o) & (pos < o + t)
    v = jnp.where(live, ct, jnp.zeros((), ct.dtype))
    core = lax.slice_in_dim(v, rad, rad + t, axis=1)
    head = jnp.flip(lax.slice_in_dim(v, 0, rad, axis=1), 1)
    tail = jnp.flip(lax.slice_in_dim(v, rad + t, rad + t + rad, axis=1), 1)
    return jnp.concatenate(
        [lax.slice_in_dim(core, 0, 1, axis=1),
         lax.slice_in_dim(core, 1, 1 + rad, axis=1) + head,
         lax.slice_in_dim(core, 1 + rad, t - 1 - rad, axis=1),
         lax.slice_in_dim(core, t - 1 - rad, t - 1, axis=1) + tail,
         lax.slice_in_dim(core, t - 1, t, axis=1)], axis=1)


from jax.extend import core as _jex_core  # noqa: E402
from jax.interpreters import ad as _ad, batching as _batching  # noqa: E402
from jax.interpreters import mlir as _mlir  # noqa: E402
from jax._src.core import (ShapedArray as _ShapedArray,  # noqa: E402
                           standard_insert_pvary as _insert_pvary,
                           standard_vma_rule as _vma_rule)

mrpad_p = _jex_core.Primitive("audiogan_mrpad")
mrpadt_p = _jex_core.Primitive("audiogan_mrpadt")


def mrpad_prim(y, offs, rad: int):
    y, offs = _insert_pvary(y, offs)
    return mrpad_p.bind(y, offs, rad=rad)


def mrpadt_prim(ct, offs, rad: int):
    ct, offs = _insert_pvary(ct, offs)
    return mrpadt_p.bind(ct, offs, rad=rad)


mrpad_p.def_abstract_eval(lambda y, offs, *, rad: _ShapedArray(
    (y.shape[0], y.shape[1] + 2 * rad, y.shape[2]), y.dtype,
    vma=_vma_rule("mrpad", y, offs)))
mrpadt_p.def_abstract_eval(lambda ct, offs, *, rad: _ShapedArray(
    (ct.shape[0], ct.shape[1] - 2 * rad, ct.shape[2]), ct.dtype,
    vma=_vma_rule("mrpadt", ct, offs)))
_mlir.register_lowering(mrpad_p, _mlir.lower_fun(
    lambda y, offs, *, rad: _mrpad_fwd(y, offs, rad),
    multiple_results=False))
_mlir.register_lowering(mrpadt_p, _mlir.lower_fun(
    lambda ct, offs, *, rad: _mrpad_t(ct, offs, rad),
    multiple_results=False))
mrpad_p.def_impl(lambda y, offs, *, rad: jax.jit(
    _mrpad_fwd, static_argnums=(2,))(y, offs, rad))
mrpadt_p.def_impl(lambda ct, offs, *, rad: jax.jit(
    _mrpad_t, static_argnums=(2,))(ct, offs, rad))


def _mrpad_linear_jvp(prim_fn):
    def jvp(primals, tangents, **params):
        x, offs = primals
        dx, _ = tangents
        y = prim_fn(x, offs, **params)
        if type(dx) is _ad.Zero:
            return y, _ad.Zero.from_primal_value(y)
        return y, prim_fn(dx, offs, **params)
    return jvp


def _mrpad_transpose(ct, y, offs, *, rad):
    assert not _ad.is_undefined_primal(offs)
    return (mrpadt_prim(ct, offs, rad=rad), None)


def _mrpadt_transpose(g, ct, offs, *, rad):
    assert not _ad.is_undefined_primal(offs)
    return (mrpad_prim(g, offs, rad=rad), None)


_ad.primitive_jvps[mrpad_p] = _mrpad_linear_jvp(mrpad_prim)
_ad.primitive_jvps[mrpadt_p] = _mrpad_linear_jvp(mrpadt_prim)
_ad.primitive_transposes[mrpad_p] = _mrpad_transpose
_ad.primitive_transposes[mrpadt_p] = _mrpadt_transpose


def _mrpad_batch_rule(prim):
    def rule(args, dims, *, rad):
        x, offs = args
        dx, d_offs = dims
        if dx is None:
            v = offs.shape[d_offs]
            x = jnp.broadcast_to(x[None], (v, *x.shape))
        else:
            x = jnp.moveaxis(x, dx, 0)
        v, bsz = x.shape[0], x.shape[1]
        if d_offs is None:
            offs_f = jnp.tile(offs[None], (v, 1))
        else:
            offs_f = jnp.moveaxis(offs, d_offs, 0)
        out = prim.bind(x.reshape(v * bsz, *x.shape[2:]),
                        offs_f.reshape(v * bsz), rad=rad)
        return out.reshape(v, bsz, *out.shape[1:]), 0
    return rule


_batching.primitive_batchers[mrpad_p] = _mrpad_batch_rule(mrpad_p)
_batching.primitive_batchers[mrpadt_p] = _mrpad_batch_rule(mrpadt_p)


def mask_reflect_pad(y: jnp.ndarray, offs: jnp.ndarray, rad: int
                     ) -> jnp.ndarray:
    """Build the primitive's xp operand: reflect-pad y by rad on both time
    ends, then zero everything outside each example's live window
    [off, off + T).  XLA fuses pad + iota-compare + where into one
    elementwise pass (2 traversals vs the select form's 2·rad+2).
    _MRPAD_PRIM=1 routes through the linear primitive pair above (same
    values; hand-written single-write transpose — see the note there)."""
    if _MRPAD_PRIM:
        return mrpad_prim(y, offs.astype(jnp.int32), rad=rad)
    return _mrpad_fwd(y, offs, rad)


# ---------------------------------------------------------------------------
# XLA-tier lowerings (exact reference: window-select then the plain conv
# lowering; also the CPU / interpret / non-TPU path)
# ---------------------------------------------------------------------------

def _sconv1d_route(xp, w, stride, pad_lo, pad_hi, rad, impl):
    b, tp, cin = xp.shape
    k, _, cout = w.shape
    t_out = (tp - 2 * rad + pad_lo + pad_hi - k) // stride + 1
    if not _sconv_fwd_ok(b, t_out, cin, cout, stride, rad, xp.dtype):
        return "xla"
    if impl == "auto":
        return "pallas" if t_out >= _AUTO_SCONV_MIN else "xla"
    return impl


def sconv1d_lowered(xp, w, offs, stride, pad_lo, pad_hi, rad, impl):
    """conv1d(window_select(xp, offs), w) — [B,T+2rad,Cin] -> [B,T',Cout]."""
    if _sconv1d_route(xp, w, stride, pad_lo, pad_hi, rad, impl) == "pallas":
        return _sconv1d_pallas(xp, w, offs, stride, pad_lo, pad_hi, rad)
    t = xp.shape[1] - 2 * rad
    z = window_select(xp, offs, t, rad)
    # Thread the ambient tier through to the consuming conv: hardcoding
    # impl="xla" here cost fused sites the winning Pallas convT band on
    # their AD-transpose path (r4 batch 2b: fused-all was 1.073 under
    # uniform xla but 1.000 under auto — the band loss ate the fusion win).
    return conv1d_lowered(z, w, stride, pad_lo, pad_hi, impl=impl)


def sconv1d_ba_lowered(xp, w, b, offs, stride, pad_lo, pad_hi, rad, act,
                       slope, impl):
    if _sconv1d_route(xp, w, stride, pad_lo, pad_hi, rad, impl) == "pallas":
        return _sconv1d_pallas(xp, w, offs, stride, pad_lo, pad_hi, rad,
                               bias=b, act=act, slope=slope)
    t = xp.shape[1] - 2 * rad
    z = window_select(xp, offs, t, rad)
    return conv1d_ba_lowered(z, w, b, stride, pad_lo, pad_hi, act, slope,
                             impl=impl)  # ambient tier (see sconv1d_lowered)


def sconvt1d_lowered(ct, wf, offs, stride, pad_lo_t, t, rad, impl):
    """window_place(convt1d(ct, wf), offs) — the transpose-of-sconv1d value:
    [B,T',Cout] x [K,Cout,Cin] -> [B, t+2rad, Cin].

    pad_lo_t is the convT's pad (k - 1 - pad_lo of the forward conv); t is
    the unpadded window length (convT out_len)."""
    b, _, cc = ct.shape
    k, _, co = wf.shape
    ok = _sconvt_ok(b, t // stride, cc, co, stride, t, ct.dtype)
    use = impl if impl != "auto" else (
        "pallas" if t // stride >= _AUTO_SCONVT_MIN else "xla")
    if ok and use == "pallas":
        return _sconvt1d_pallas(ct, wf, offs, stride, pad_lo_t, t, rad)
    u = convt1d_lowered(ct, wf, stride, pad_lo_t, t, impl=impl)
    return window_place(u, offs, rad)


# ---------------------------------------------------------------------------
# Pallas tier: the shuffle rides the conv kernel's data movement.
#
# fwd (sconv1d): decompose off = r_row*s + r_sub. The whole-row part shifts
# each example's haloed input DMA start (free — the DMA start is already a
# computed index); the sub-row part is a "funnel shift" on the DMA'd
# [rows, s*cin] tile: one dynamic lane roll by r_sub*cin + one static row
# roll + one select (3 VPU passes over a tile the kernel reads Q times for
# matmuls anyway). No shuffled activation ever exists in HBM.
#
# transpose (sconvt1d): the place() offset moves to the OUTPUT side — the
# accumulator is computed for t_tile+1 rows (one leading row of overlap
# with the previous tile), funnel-shifted by r_sub on the (rho, cin) lanes,
# and written to HBM by a manual double-buffered DMA whose destination row
# start carries r_row. Rows the shift leaves unwritten hold garbage; the
# caller's live-window mask (required for place() exactness anyway) zeroes
# them in the same pass that unpacks the row layout.
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiogan_tpu.kernels import conv as kc
from audiogan_tpu.kernels.conv import (_cdiv, _in_ch_blocks, _round_up,
                                       _convt_phase_range, _convt_phase_taps,
                                       _vma_sds, MIN_CH)

# auto-router bands (module globals so step-level ablations can override,
# like kc._AUTO_*). Unlike the plain conv1d band (empty — pallas conv1d fwd
# loses 1.25-1.47x to XLA), the fused fwd also REMOVES the select form's
# (2rad+2)-traversal materialization, so it starts enabled pending the
# step-level A/B; the sconvt band mirrors the winning convt band.
_AUTO_SCONV_MIN = 256           # sconv1d fwd -> pallas when t_out >= this
_AUTO_SCONVT_MIN = 64           # sconvt1d -> pallas when m_out >= this


def _backend_ok() -> bool:
    return kc._auto_backend_ok()


def _fit_tile(t_tile: int, q_taps: int, lanes_in: int, lanes_out: int,
              itemsize: int, extra_rows: int) -> int:
    """Largest multiple-of-16 row tile fitting the 13 MiB scoped-VMEM
    budget: double-buffered haloed input + funnel scratch (fwd) or
    extended accumulator + output double buffer (transpose)."""
    budget = 13 * 1024 * 1024
    w_bytes = q_taps * lanes_in * lanes_out * itemsize
    while True:
        rows_tile = _round_up(t_tile + q_taps + extra_rows, 16)
        need = (3 * rows_tile * lanes_in * itemsize      # 2x dbl buf + funnel
                + w_bytes
                + (t_tile + 16) * lanes_out * 4          # f32 accumulator
                + 2 * t_tile * lanes_out * itemsize      # out (dbl) window
                + 2 * t_tile * lanes_out * itemsize)     # pipeline headroom
        if need <= budget:
            return t_tile
        if t_tile <= 16:
            raise ValueError(
                f"sconv tile does not fit VMEM: q_taps={q_taps} "
                f"lanes={lanes_in}x{lanes_out} needs {need / 2**20:.1f} MiB")
        t_tile -= 16


def _sconv_kernel(offs_ref, x_hbm, w_ref, *rest, s, cin_blk, q_taps, t_tile,
                  rows_tile, r_row_max, grid_dims, act, slope, has_bias,
                  pad_lo, t):
    """Fused-shuffle rowconv body (see kc._rowconv_kernel for the base
    pipeline: double-buffered haloed DMA + Q shifted matmuls + persistent
    f32 accumulator + fused epilogue)."""
    if has_bias:
        b_ref, o_ref, xs, zs, acc, sem = rest
    else:
        b_ref, (o_ref, xs, zs, acc, sem) = None, rest
    b, ti, co, ci = (pl.program_id(i) for i in range(4))
    nb, nt, nco, nci = grid_dims
    total = nb * nt * nco * nci
    linear = ((b * nt + ti) * nco + co) * nci + ci
    slot = linear % 2

    def make_dma(b_, ti_, ci_, slot_):
        # ALIGNED start: a dynamic (offs-dependent) row offset here fails
        # Mosaic's sublane-divisibility proof ("tile index in dimension 2
        # is divisible by the tiling (8)", r4 HW log). The whole-row part
        # of the shift is applied in VMEM below instead; rows_tile carries
        # r_row_max extra halo rows to cover it.
        src = x_hbm.at[b_, ci_, pl.ds(ti_ * t_tile, rows_tile), :]
        return pltpu.make_async_copy(src, xs.at[slot_], sem.at[slot_])

    @pl.when(linear == 0)
    def _():
        make_dma(b, ti, ci, slot).start()

    nxt = linear + 1

    @pl.when(nxt < total)
    def _():
        ci_n = nxt % nci
        rest_ = nxt // nci
        ti_n = (rest_ // nco) % nt
        b_n = rest_ // (nco * nt)
        make_dma(b_n, ti_n, ci_n, nxt % 2).start()

    make_dma(b, ti, ci, slot).wait()

    # funnel: z[r] = concat(a[r, r_sub*c:], a[r+1, :r_sub*c]) — the sub-row
    # part of the per-example shift, applied once per tile.
    # Mosaic's tpu.dynamic_rotate only supports 32-bit vectors (bf16 fails
    # "Rotate with non-32-bit data", r4 HW log), so sub-32-bit tiles roll
    # through an f32 view and cast back on the zs store — 2 extra VPU
    # passes over a tile the matmul loop reads Q times anyway.
    a = xs[slot]
    if a.dtype.itemsize < 4:
        a = a.astype(jnp.float32)
    # whole-row part of the shift (r_row = offs//s): select over the
    # r_row_max+1 statically-rolled copies — roll amounts must be static
    # on the 8-tiled sublane dim (and the aligned DMA above requires the
    # shift to happen here). r_row_max is 0 or 1 at every shipped
    # geometry, so this is at most ONE extra VPU pass.
    if r_row_max:
        r_row = offs_ref[b] // s
        sel_a = a
        for rr in range(1, r_row_max + 1):
            cand = pltpu.roll(a, rows_tile - rr, axis=0)   # row r <- a[r+rr]
            sel_a = jnp.where(r_row == rr, cand, sel_a)
        a = sel_a
    lanes = s * cin_blk
    r_sub = offs_ref[b] % s
    sh = jnp.where(r_sub == 0, 0, lanes - r_sub * cin_blk)
    r1 = pltpu.roll(a, sh, axis=1)
    r2 = pltpu.roll(r1, rows_tile - 1, axis=0)  # row r+1 into row r
    lane = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    z = jnp.where(lane < lanes - r_sub * cin_blk, r1, r2)
    # conv-pad mask: z-space sample (row*s + lane_sample - pad_lo relative
    # to this tile) outside [0, t) is the conv's zero padding — the shifted
    # read window covers real xp data there, which select+conv never reads.
    # Off-independent: the shift maps z positions to xp positions, so only
    # z-space validity matters (2 compares + select per tile).
    row = lax.broadcasted_iota(jnp.int32, a.shape, 0)
    sample = (ti * t_tile + row) * s + lane // cin_blk - pad_lo
    zs[...] = jnp.where((sample >= 0) & (sample < t), z,
                        jnp.zeros((), z.dtype)).astype(zs.dtype)

    @pl.when(ci == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    av = acc[...]
    for q in range(q_taps):                     # static unroll
        av += jnp.dot(zs[pl.ds(q, t_tile), :], w_ref[0, 0, q],
                      preferred_element_type=jnp.float32)
    acc[...] = av

    @pl.when(ci == nci - 1)
    def _():
        r = av if b_ref is None else av + b_ref[0]
        o_ref[0, 0] = kc._apply_act(r, act, slope).astype(o_ref.dtype)


def _sconv1d_pallas(xp, w, offs, stride, pad_lo, pad_hi, rad,
                    bias=None, act="none", slope=0.2):
    s = stride
    b, tp, cin = xp.shape
    k, _, cout = w.shape
    t = tp - 2 * rad
    t_out = (t + pad_lo + pad_hi - k) // s + 1
    cin_p, cin_blk = _in_ch_blocks(cin, s)
    cout_p = _round_up(cout, 128)
    if cout_p > 256:
        cout_p = _round_up(cout_p, 256)
    cout_blk = min(cout_p, 256)
    q_taps = _cdiv(k, s)
    n_ci, n_co = cin_p // cin_blk, cout_p // cout_blk
    r_row_max = (2 * rad) // s

    t_tile = _fit_tile(min(_round_up(t_out, 16), kc._T_TILE_CAP), q_taps,
                       s * cin_blk, cout_blk, xp.dtype.itemsize, r_row_max)
    n_t = _cdiv(t_out, t_tile)
    # +1 halo row over the plain conv (the funnel reads row r+1), plus
    # r_row_max rows so the ALIGNED tile DMA covers the largest whole-row
    # shift (applied in VMEM — see _sconv_kernel)
    rows_tile = _round_up(t_tile + q_taps + r_row_max, 16)
    rows_needed = (n_t - 1) * t_tile + rows_tile
    pad_back = rows_needed * s - pad_lo - tp
    xq = jnp.pad(xp, ((0, 0), (pad_lo, max(pad_back, 0)),
                      (0, cin_p - cin)))[:, :rows_needed * s]
    xr = xq.reshape(b, rows_needed, s, n_ci, cin_blk)
    x_rows = xr.transpose(0, 3, 1, 2, 4).reshape(b, n_ci, rows_needed,
                                                 s * cin_blk)

    wp = jnp.pad(w, ((0, q_taps * s - k), (0, cin_p - cin),
                     (0, cout_p - cout)))
    wt = wp.reshape(q_taps, s, n_ci, cin_blk, n_co, cout_blk)
    w_taps = wt.transpose(2, 4, 0, 1, 3, 5).reshape(
        n_ci, n_co, q_taps, s * cin_blk, cout_blk)

    grid = (b, n_t, n_co, n_ci)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # offs [B]
        pl.BlockSpec(memory_space=pl.ANY),       # x rows stay in HBM
        pl.BlockSpec((1, 1, q_taps, s * cin_blk, cout_blk),
                     lambda b_, t_, co_, ci_: (ci_, co_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [offs.astype(jnp.int32), x_rows, w_taps]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, cout_blk),
                                     lambda b_, t_, co_, ci_: (co_, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.pad(bias, (0, cout_p - cout)).astype(
            jnp.float32).reshape(n_co, 1, cout_blk))
    out = pl.pallas_call(
        functools.partial(_sconv_kernel, s=s, cin_blk=cin_blk,
                          q_taps=q_taps, t_tile=t_tile, rows_tile=rows_tile,
                          r_row_max=r_row_max, grid_dims=grid, act=act,
                          slope=slope, has_bias=bias is not None,
                          pad_lo=pad_lo, t=t),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, t_tile, cout_blk),
                               lambda b_, t_, co_, ci_: (b_, co_, t_, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_vma_sds((b, n_co, n_t * t_tile, cout_blk), xp.dtype,
                           x_rows, w_taps, bias),
        scratch_shapes=[
            pltpu.VMEM((2, rows_tile, s * cin_blk), xp.dtype),
            pltpu.VMEM((rows_tile, s * cin_blk), xp.dtype),   # funnel
            pltpu.VMEM((t_tile, cout_blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_out * k * cin * cout,
            bytes_accessed=(b * rows_needed * s * cin_p * n_co
                            + q_taps * s * cin_p * cout_p
                            + b * t_out * cout_p) * xp.dtype.itemsize,
            transcendentals=(b * t_out * cout_p if act == "tanh" else 0)),
        interpret=kc._INTERPRET,
    )(*args)
    out = out.transpose(0, 2, 1, 3).reshape(b, n_t * t_tile, n_co * cout_blk)
    return out[:, :t_out, :cout]


def _sconvt_kernel(offs_ref, x_hbm, w_ref, o_hbm, xs, acc, obuf, sem, sem_o,
                   *, s, co_blk, q_taps, t_tile, t_ext, rows_tile,
                   r_row_max, grid_dims):
    b, ti, co, ci = (pl.program_id(i) for i in range(4))
    nb, nt, nco, nci = grid_dims
    total = nb * nt * nco * nci
    linear = ((b * nt + ti) * nco + co) * nci + ci
    slot = linear % 2
    n_osteps = nb * nt * nco

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
        rest_ = nxt // nci
        ti_n = (rest_ // nco) % nt
        b_n = rest_ // (nco * nt)
        make_dma(b_n, ti_n, ci_n, nxt % 2).start()

    make_dma(b, ti, ci, slot).wait()

    @pl.when(ci == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    av = acc[...]
    for q in range(q_taps):                     # static unroll
        av += jnp.dot(xs[slot, pl.ds(q, t_ext), :], w_ref[0, 0, q],
                      preferred_element_type=jnp.float32)
    acc[...] = av

    lanes = av.shape[-1]

    def make_odma(b_, ti_, co_, slot_):
        # ALIGNED destination (same Mosaic sublane-divisibility constraint
        # as the fwd input DMA): the whole-row part of the place() shift
        # is folded into the funnel rolls below instead of the DMA start.
        dst = o_hbm.at[b_, co_, pl.ds(ti_ * t_tile, t_tile), :]
        return pltpu.make_async_copy(obuf.at[slot_], dst, sem_o.at[slot_])

    @pl.when(ci == nci - 1)
    def _():
        # place(): funnel the accumulator by the WHOLE shift. acc row j
        # holds u row ti*t_tile + j - 1 - r_row_max (the caller's `front`
        # carries r_row_max extra leading rows); output row
        # M = ti*t_tile + m takes lanes >= r_sub*c from u row M - r_row
        # (= acc[m + 1 + r_row_max - r_row]) and the rest from u row
        # M - r_row - 1 (= acc[m + r_row_max - r_row]). The row offsets
        # are dynamic in r_row, and sublane rolls must be static — select
        # over the r_row_max+1 statically-rolled candidates (r_row_max is
        # 0 or 1 at every shipped geometry; at 0 this reduces to exactly
        # one static roll + no select).
        r_sub = offs_ref[b] % s
        r_row = offs_ref[b] // s
        sh = r_sub * co_blk
        rf = pltpu.roll(av, sh, axis=1)

        def shifted(d):                         # row m <- rf[m + d]
            return pltpu.roll(rf, (t_ext - d) % t_ext, axis=0) if d else rf

        hi = shifted(1 + r_row_max)
        lo = shifted(r_row_max)
        for rr in range(1, r_row_max + 1):
            sel = r_row == rr
            hi = jnp.where(sel, shifted(1 + r_row_max - rr), hi)
            lo = jnp.where(sel, shifted(r_row_max - rr), lo)
        lane = lax.broadcasted_iota(jnp.int32, rf.shape, 1)
        o = jnp.where(lane >= sh, hi, lo)[:t_tile]
        o_step = (b * nt + ti) * nco + co
        slot_o = o_step % 2

        @pl.when(o_step >= 2)
        def _():
            # wait the DMA that used this slot two output-steps ago (same
            # semaphore, same transfer size — the descriptor's indices only
            # size the wait)
            make_odma(b, ti, co, slot_o).wait()

        obuf[slot_o] = o.astype(obuf.dtype)
        make_odma(b, ti, co, slot_o).start()

    @pl.when(linear == total - 1)
    def _():
        # drain: the last output DMA just issued on slot_o, and (if any)
        # the previous one on the other slot is still outstanding
        slot_l = (n_osteps - 1) % 2
        make_odma(b, ti, co, slot_l).wait()
        if n_osteps >= 2:
            make_odma(b, ti, co, 1 - slot_l).wait()


def _sconvt1d_pallas(ct, wf, offs, stride, pad_lo_t, t, rad):
    s = stride
    b, t_in, cc = ct.shape
    k, _, co = wf.shape
    assert t % s == 0
    m_out = t // s
    cc_p = _round_up(cc, 128)
    if cc_p > 256:
        cc_p = _round_up(cc_p, 256)
    cc_blk = min(cc_p, 256)
    co_p, co_blk = _in_ch_blocks(co, s, blk_cap=max(1024 // s // 128, 1) * 128)
    n_ci, n_co = cc_p // cc_blk, co_p // co_blk
    lanes_out = s * co_blk
    r_row_max = (2 * rad) // s

    q_min, q_taps = _convt_phase_range(k, s, pad_lo_t)
    # ALIGNED writes cover every row up to ceil((t+2rad)/s): the shift no
    # longer moves the DMA window, so the tiles themselves must span the
    # shifted tail (music: 2rad > s, one extra row past m_out+1)
    rows_out = _cdiv(t + 2 * rad, s)
    t_tile = _fit_tile(min(_round_up(rows_out, 16), kc._T_TILE_CAP),
                       q_taps, cc_blk, lanes_out, ct.dtype.itemsize, 16)
    n_t = _cdiv(rows_out, t_tile)
    t_ext = t_tile + 16                 # leading overlap rows (aligned);
                                        # 1 + r_row_max of the 16 are used
    rows_tile = _round_up(t_ext + q_taps - 1, 16)
    rows_needed = (n_t - 1) * t_tile + rows_tile
    # acc row j = u row base + j - 1 - r_row_max (funnel reads back up to
    # r_row_max+1 rows for the whole-row shift)
    front = -q_min + 1 + r_row_max
    pad_back = rows_needed - front - t_in
    if pad_back < 0:
        ct, t_in, pad_back = ct[:, :t_in + pad_back], t_in + pad_back, 0
    x_pad = jnp.pad(ct, ((0, 0), (front, pad_back), (0, cc_p - cc)))
    xr = x_pad.reshape(b, rows_needed, n_ci, cc_blk)
    x_rows = xr.transpose(0, 2, 1, 3)

    wp = jnp.pad(wf, ((0, 0), (0, cc_p - cc), (0, co_p - co)))
    v, _, _ = _convt_phase_taps(wp, s, pad_lo_t)        # [Q, s, cc_p, co_p]
    v = v.transpose(0, 2, 1, 3)                         # [Q, cc_p, s, co_p]
    v = v.reshape(q_taps, n_ci, cc_blk, s, n_co, co_blk)
    w_taps = v.transpose(1, 4, 0, 2, 3, 5).reshape(
        n_ci, n_co, q_taps, cc_blk, lanes_out)

    r_alloc = n_t * t_tile
    grid = (b, n_t, n_co, n_ci)
    out = pl.pallas_call(
        functools.partial(_sconvt_kernel, s=s, co_blk=co_blk, q_taps=q_taps,
                          t_tile=t_tile, t_ext=t_ext, rows_tile=rows_tile,
                          r_row_max=r_row_max, grid_dims=grid),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # offs [B]
            pl.BlockSpec(memory_space=pl.ANY),          # ct rows in HBM
            pl.BlockSpec((1, 1, q_taps, cc_blk, lanes_out),
                         lambda b_, t_, co_, ci_: (ci_, co_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),    # manual shifted DMA
        out_shape=_vma_sds((b, n_co, r_alloc, lanes_out), ct.dtype,
                           x_rows, w_taps),
        scratch_shapes=[
            pltpu.VMEM((2, rows_tile, cc_blk), ct.dtype),
            pltpu.VMEM((t_ext, lanes_out), jnp.float32),
            pltpu.VMEM((2, t_tile, lanes_out), ct.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_out * k * cc * co,
            bytes_accessed=(b * rows_needed * cc_p * n_co
                            + q_taps * s * cc_p * co_p
                            + b * t * co_p) * ct.dtype.itemsize,
            transcendentals=0),
        interpret=kc._INTERPRET,
    )(offs.astype(jnp.int32), x_rows, w_taps)
    out = out.reshape(b, n_co, r_alloc, s, co_blk)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, r_alloc * s, n_co * co_blk)
    out = out[:, :t + 2 * rad, :co]
    # live-window mask: place() is zero outside [off, off+t); this also
    # zeroes the tile-edge rows whose funnel candidates wrapped (fused
    # into the unpack)
    pos = jnp.arange(t + 2 * rad, dtype=jnp.int32)[None, :, None]
    o = offs[:, None, None]
    return jnp.where((pos >= o) & (pos < o + t), out,
                     jnp.zeros((), out.dtype))


def _sconv_fwd_ok(b, t_out, cin, cout, s, rad, dtype) -> bool:
    return (_backend_ok() and min(cin, cout) >= MIN_CH and b > 1
            and dtype in (jnp.float32, jnp.bfloat16))


def _sconvt_ok(b, m_out, cc, co, s, t, dtype) -> bool:
    return (_backend_ok() and min(cc, co) >= MIN_CH and t % s == 0
            and b > 1 and dtype in (jnp.float32, jnp.bfloat16))


def sconv1d_ba(y: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
               key: jax.Array, rad: int, stride: int = 1,
               padding="SAME", act: str = "none", slope: float = 0.2,
               impl: str = "pallas") -> jnp.ndarray:
    """Fused phase_shuffle -> conv1d_ba: act(conv(phase_shuffle(y, key,
    rad), w) + b), drawing the SAME shift stream as ops.phase_shuffle
    (shifts = randint(key, [B], -rad, rad+1)) so fused and unfused critics
    are numerically interchangeable. Arbitrary-order differentiable via
    the sconv primitive family (kernels/primitives.py)."""
    from audiogan_tpu.kernels.conv import _same_pads_public
    from audiogan_tpu.kernels.primitives import sconv1d_ba_prim
    bsz, t, _ = y.shape
    shifts = jax.random.randint(key, (bsz,), -rad, rad + 1)
    offs = (rad - shifts).astype(jnp.int32)
    xp = mask_reflect_pad(y, offs, rad)
    _, lo, hi = _same_pads_public(t, w.shape[0], stride, padding)
    return sconv1d_ba_prim(xp, w, b, offs, stride=stride, pad_lo=lo,
                           pad_hi=hi, rad=rad, act=act, slope=slope,
                           impl=impl)
