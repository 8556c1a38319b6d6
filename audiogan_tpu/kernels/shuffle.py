"""Phase shuffle as a single-HBM-pass Pallas kernel (SURVEY C10 hot path).

Motivation (r3s6b device profile, flagship step): the original vmap'd
dynamic_slice phase shuffle lowered to an XLA gather whose vjp is a
scatter-add; together they ate 24% of step device time. The select-over-
static-slices reformulation (ops/phase_shuffle._apply_shifts) removed the
gather/scatter (+15.8% step rate) but reads the activation (2*rad+1) times
from HBM — phase shuffle is pure data movement, so its speed-of-light is
one HBM read + one HBM write. This kernel hits that: each [rows, T, C]
block crosses HBM exactly once in each direction; the (2*rad+1)-way select
and the reflect-pad extension happen on VMEM-resident data.

Why primitives and not custom_vjp: phase shuffle sits inside D on the
WGAN-GP double-backprop path (reverse-over-reverse), same as the conv
primitives (kernels/primitives.py). The op is LINEAR in x for fixed
shifts, so the primitive pair is closed under AD to any order:

    jvp(pshuf)        = pshuf            (linear)
    transpose(pshuf)  = pshuf_t          (place-at-offset + reflect-fold)
    jvp(pshuf_t)      = pshuf_t
    transpose(pshuf_t)= pshuf

Semantics (both directions share the jnp math, so the Pallas kernel body
and the XLA fallback are the same code):

    pshuf(x, starts)[b, i, :]   = reflect_pad(x, rad)[b, starts[b] + i, :]
    pshuf_t = the exact linear transpose of pshuf (scatter the cotangent
    to its window, then fold the reflect-pad edge contributions back)

with starts[b] = rad - n_b in [0, 2*rad] for shift n_b in [-rad, rad].
The shift selector rides as a [B, 1, 1] int32 VMEM operand compared
against each static window index — no scalar-prefetch, no dynamic slices,
no gathers; Mosaic sees static slices, broadcasts, selects and adds only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

from jax._src.core import (ShapedArray,  # noqa: E402
                           standard_insert_pvary, standard_vma_rule)

_INTERPRET = False  # flipped by tests on CPU

# VMEM budget per grid step (bytes). The fwd block peak holds the input
# rows, the (T+2*rad)-row reflect-extended copy, the output and one select
# temp, double-buffered by the pipeline.
_VMEM_BUDGET = 6 * 1024 * 1024


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


def _rows_blk(b: int, t: int, c: int, rad: int, itemsize: int) -> int:
    c_pad = _round_up(c, 128)
    per_row = (4 * t + 4 * rad) * c_pad * itemsize
    rb = min(b, 8, max(1, _VMEM_BUDGET // (2 * per_row)))
    while b % rb:
        rb -= 1
    return rb


def supported(t: int, rad: int, c: int | None = None,
              itemsize: int = 2) -> bool:
    # reflect padding reads rows 1..rad and t-1-rad..t-2
    if t < rad + 2:
        return False
    if c is None:
        return True
    # even a single-row block must fit VMEM: 2x input + 2x output
    # (pipeline double-buffering) + the extended copy and one select temp
    # (single-instance kernel temps), against the same 13 MB scoped budget
    # the conv kernels use. Music-geometry activations (t=25200, c=64)
    # want a ~39 MB frame and must fall back to the select form instead
    # of a Mosaic compile OOM; the flagship t=4096 frame (~6.3 MB) fits.
    frame = (6 * t + 8 * rad) * _round_up(c, 128) * itemsize
    return frame <= 13 * 1024 * 1024


# ---------------------------------------------------------------------------
# shared jnp math (kernel body == XLA fallback)
# ---------------------------------------------------------------------------

def _fwd_math(xv: jnp.ndarray, sv: jnp.ndarray, rad: int) -> jnp.ndarray:
    """[rb, t, c] x [rb, 1, 1] int32 -> [rb, t, c].

    sv rides as a 3D [rb, 1, 1] operand: Mosaic requires a block's last
    TWO dims be (8,128)-divisible or equal to the array's — (1, 1) == the
    array's trailing dims, leaving the row-block dim unconstrained (a 2D
    [rb, 1] selector block is illegal whenever rb is not a multiple of 8).
    """
    rb, t, c = xv.shape
    left = [xv[:, m:m + 1, :] for m in range(rad, 0, -1)]
    right = [xv[:, t - 2 - m:t - 1 - m, :] for m in range(rad)]
    xp = jnp.concatenate(left + [xv] + right, axis=1)  # [rb, t+2rad, c]
    out = None
    for j in range(2 * rad + 1):
        sel = (sv == j)                                # [rb, 1, 1]
        term = jnp.where(sel, xp[:, j:j + t, :], jnp.zeros((), xv.dtype))
        out = term if out is None else out + term
    return out


def _pad_rows(a: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Zero-pad along the row (sublane) axis via concatenate — Mosaic
    lowers concatenate (the fwd path uses it); lax.pad it may not."""
    rb, _, c = a.shape
    parts = []
    if lo:
        parts.append(jnp.zeros((rb, lo, c), a.dtype))
    parts.append(a)
    if hi:
        parts.append(jnp.zeros((rb, hi, c), a.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _bwd_math(gv: jnp.ndarray, sv: jnp.ndarray, rad: int) -> jnp.ndarray:
    """Exact transpose of _fwd_math in its first argument."""
    rb, t, c = gv.shape
    zero = jnp.zeros((), gv.dtype)
    buf = None                                         # [rb, t+2rad, c]
    for j in range(2 * rad + 1):
        sel = (sv == j)                                # [rb, 1, 1]
        term = jnp.where(sel, _pad_rows(gv, j, 2 * rad - j), zero)
        buf = term if buf is None else buf + term
    gx = buf[:, rad:rad + t, :]
    # transpose of the reflect extension: xp row rad-1-m read x[m+1] (left),
    # xp row rad+t+m read x[t-2-m] (right) — fold those rows back in
    for m in range(rad):
        row = buf[:, rad - 1 - m:rad - m, :]
        gx = gx + _pad_rows(row, m + 1, t - m - 2)
    for m in range(rad):
        row = buf[:, rad + t + m:rad + t + m + 1, :]
        gx = gx + _pad_rows(row, t - 2 - m, m + 1)
    return gx


# ---------------------------------------------------------------------------
# pallas lowering
# ---------------------------------------------------------------------------

def _kernel(s_ref, x_ref, o_ref, *, rad, math):
    o_ref[...] = math(x_ref[...], s_ref[...], rad)


def _pshuf_pallas(x, starts, rad: int, math) -> jnp.ndarray:
    b, t, c = x.shape
    rb = _rows_blk(b, t, c, rad, x.dtype.itemsize)
    from audiogan_tpu.kernels.conv import _vma_sds
    return pl.pallas_call(
        functools.partial(_kernel, rad=rad, math=math),
        grid=(b // rb,),
        in_specs=[pl.BlockSpec((rb, 1, 1), lambda g: (g, 0, 0)),
                  pl.BlockSpec((rb, t, c), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((rb, t, c), lambda g: (g, 0, 0)),
        out_shape=_vma_sds((b, t, c), x.dtype, x, starts),
        interpret=_INTERPRET,
    )(starts.reshape(b, 1, 1).astype(jnp.int32), x)


def _lowered(x, starts, rad: int, impl: str, math):
    # the VMEM gate also guards forced impl="pallas": unsupported
    # geometries (huge per-row frames) take the select math instead of a
    # Mosaic compile OOM
    if impl == "pallas" and supported(x.shape[1], rad, x.shape[2],
                                      x.dtype.itemsize):
        return _pshuf_pallas(x, starts, rad, math)
    return math(x, starts[:, None, None].astype(jnp.int32), rad)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

pshuf_p = jex_core.Primitive("audiogan_pshuf")
pshuf_t_p = jex_core.Primitive("audiogan_pshuf_t")


def pshuf_prim(x, starts, rad: int, impl: str = "pallas"):
    x, starts = standard_insert_pvary(x, starts)
    return pshuf_p.bind(x, starts, rad=rad, impl=impl)


def pshuf_t_prim(g, starts, rad: int, impl: str = "pallas"):
    g, starts = standard_insert_pvary(g, starts)
    return pshuf_t_p.bind(g, starts, rad=rad, impl=impl)


def _pshuf_impl(x, starts, *, rad, impl):
    return _lowered(x, starts, rad, impl, _fwd_math)


def _pshuf_t_impl(g, starts, *, rad, impl):
    return _lowered(g, starts, rad, impl, _bwd_math)


def _abstract(prim):
    def rule(x, starts, *, rad, impl):
        assert x.ndim == 3 and starts.shape == (x.shape[0],), (
            x.shape, starts.shape)
        vma = standard_vma_rule(prim.name, x, starts)
        if vma:
            return ShapedArray(x.shape, x.dtype, vma=vma,
                               sharding=x.sharding)
        return ShapedArray(x.shape, x.dtype)
    return rule


pshuf_p.def_abstract_eval(_abstract(pshuf_p))
pshuf_t_p.def_abstract_eval(_abstract(pshuf_t_p))


def _eager_impl(prim, body):
    cache: dict = {}

    def impl(*args, **params):
        key = tuple(sorted(params.items()))
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = jax.jit(functools.partial(body, **params))
        return fn(*args)
    return impl


pshuf_p.def_impl(_eager_impl(pshuf_p, _pshuf_impl))
pshuf_t_p.def_impl(_eager_impl(pshuf_t_p, _pshuf_t_impl))

mlir.register_lowering(
    pshuf_p, mlir.lower_fun(_pshuf_impl, multiple_results=False))
mlir.register_lowering(
    pshuf_t_p, mlir.lower_fun(_pshuf_t_impl, multiple_results=False))

# linear in x; starts is integer data (non-differentiable)
ad.defjvp(pshuf_p,
          lambda g, x, starts, *, rad, impl:
          pshuf_prim(g, starts, rad=rad, impl=impl), None)
ad.defjvp(pshuf_t_p,
          lambda g, x, starts, *, rad, impl:
          pshuf_t_prim(g, starts, rad=rad, impl=impl), None)


def _transpose(other_prim_bind):
    def rule(ct, x, starts, *, rad, impl):
        assert ad.is_undefined_primal(x)
        if type(ct) is ad.Zero:
            return [ad.Zero(x.aval), None]
        return [other_prim_bind(ct, starts, rad=rad, impl=impl), None]
    return rule


ad.primitive_transposes[pshuf_p] = _transpose(pshuf_t_prim)
ad.primitive_transposes[pshuf_t_p] = _transpose(pshuf_prim)


def _batch_rule(prim):
    def rule(args, dims, **params):
        x, s = args
        dx, ds = dims
        x = jnp.moveaxis(x, dx, 0)
        v, b, t, c = x.shape
        if ds is None:
            s = jnp.broadcast_to(s[None], (v, b))
        else:
            s = jnp.moveaxis(s, ds, 0)
        out = prim.bind(x.reshape(v * b, t, c), s.reshape(v * b), **params)
        return out.reshape(v, b, t, c), 0
    return rule


batching.primitive_batchers[pshuf_p] = _batch_rule(pshuf_p)
batching.primitive_batchers[pshuf_t_p] = _batch_rule(pshuf_t_p)
