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


def mask_reflect_pad(y: jnp.ndarray, offs: jnp.ndarray, rad: int
                     ) -> jnp.ndarray:
    """Build the primitive's xp operand: reflect-pad y by rad on both time
    ends, then zero everything outside each example's live window
    [off, off + T).  XLA fuses pad + iota-compare + where into one
    elementwise pass (2 traversals vs the select form's 2·rad+2)."""
    b, t, c = y.shape
    xp = jnp.pad(y, ((0, 0), (rad, rad), (0, 0)), mode="reflect")
    pos = jnp.arange(t + 2 * rad, dtype=jnp.int32)[None, :, None]
    o = offs[:, None, None]
    live = (pos >= o) & (pos < o + t)
    return jnp.where(live, xp, jnp.zeros((), xp.dtype))


# ---------------------------------------------------------------------------
# XLA-tier lowerings (exact reference: window-select then the plain conv
# lowering; also the CPU / interpret / non-TPU path)
# ---------------------------------------------------------------------------

def sconv1d_lowered(xp, w, offs, stride, pad_lo, pad_hi, rad, impl):
    """conv1d(window_select(xp, offs), w) — [B,T+2rad,Cin] -> [B,T',Cout]."""
    if impl == "pallas" and _pallas_ok(xp, w, stride):
        return _sconv1d_pallas(xp, w, offs, stride, pad_lo, pad_hi, rad)
    t = xp.shape[1] - 2 * rad
    z = window_select(xp, offs, t, rad)
    return conv1d_lowered(z, w, stride, pad_lo, pad_hi, impl="xla")


def sconv1d_ba_lowered(xp, w, b, offs, stride, pad_lo, pad_hi, rad, act,
                       slope, impl):
    if impl == "pallas" and _pallas_ok(xp, w, stride):
        return _sconv1d_pallas(xp, w, offs, stride, pad_lo, pad_hi, rad,
                               bias=b, act=act, slope=slope)
    t = xp.shape[1] - 2 * rad
    z = window_select(xp, offs, t, rad)
    return conv1d_ba_lowered(z, w, b, stride, pad_lo, pad_hi, act, slope,
                             impl="xla")


def sconvt1d_lowered(ct, wf, offs, stride, pad_lo_t, t, rad, impl):
    """window_place(convt1d(ct, wf), offs) — the transpose-of-sconv1d value:
    [B,T',Cout] x [K,Cout,Cin] -> [B, t+2rad, Cin].

    pad_lo_t is the convT's pad (k - 1 - pad_lo of the forward conv); t is
    the unpadded window length (convT out_len)."""
    if impl == "pallas" and _pallas_ok(ct, wf, stride):
        return _sconvt1d_pallas(ct, wf, offs, stride, pad_lo_t, t, rad)
    u = convt1d_lowered(ct, wf, stride, pad_lo_t, t, impl="xla")
    return window_place(u, offs, rad)


# ---------------------------------------------------------------------------
# Pallas tier (stage 2): weight-stack kernels — scalar-prefetched variant
# selection on the existing rowconv/convT kernels. Until the stacked
# kernels land, the pallas tier routes to the XLA forms.
# ---------------------------------------------------------------------------

def _pallas_ok(x, w, stride) -> bool:
    return False


def _sconv1d_pallas(xp, w, offs, stride, pad_lo, pad_hi, rad,
                    bias=None, act="none", slope=0.2):
    raise NotImplementedError


def _sconvt1d_pallas(ct, wf, offs, stride, pad_lo_t, t, rad):
    raise NotImplementedError


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
