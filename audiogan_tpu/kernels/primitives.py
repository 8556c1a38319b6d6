"""conv1d / conv_transpose1d as first-class JAX primitives (SURVEY R2).

Why primitives and not jax.custom_vjp: the WGAN-GP loss differentiates
grad_x D(x) w.r.t. params — reverse-over-reverse. custom_vjp only supplies
ONE derivative level; at the second level JAX re-traces the fwd body and
hits the raw pallas_call with a JVP it cannot derive. A primitive with
bilinear JVP + transpose rules (the same mechanism lax.conv uses) is
differentiable to ANY order, in both forward and reverse mode, because
every transpose re-enters one of these primitives:

    transpose_x(conv1d)          = convt1d (flipped/transposed kernel)
    transpose_w(conv1d)          = strided einsum (native ops)
    transpose_x(convt1d)         = conv1d
    transpose_w(convt1d)         = phase einsum (native ops)

The Pallas kernels in kernels/conv.py provide the lowering; shapes hostile
to the MXU fall back to lax.conv inside the same lowering, so callers never
branch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir


# ---------------------------------------------------------------------------
# conv1d primitive: params (stride, pad_lo, pad_hi)
# ---------------------------------------------------------------------------

conv1d_p = jex_core.Primitive("audiogan_conv1d")
convt1d_p = jex_core.Primitive("audiogan_convt1d")


# vma (varying-manual-axes) plumbing for vma-checked shard_map bodies
# (jax.shard_map(..., check_vma=True) types every value with the mesh axes
# it varies over; a primitive must lift unvarying operands — the replicated
# weights — to the union and declare its output's vma, exactly like lax
# primitives do via these two helpers).
from jax._src.core import (ShapedArray,  # noqa: E402
                           standard_insert_pvary, standard_vma_rule)


def conv1d_prim(x, w, stride: int, pad_lo: int, pad_hi: int,
                impl: str = "pallas"):
    x, w = standard_insert_pvary(x, w)
    return conv1d_p.bind(x, w, stride=stride, pad_lo=pad_lo, pad_hi=pad_hi,
                         impl=impl)


def convt1d_prim(x, w, stride: int, pad_lo: int, out_len: int,
                 impl: str = "pallas"):
    x, w = standard_insert_pvary(x, w)
    return convt1d_p.bind(x, w, stride=stride, pad_lo=pad_lo,
                          out_len=out_len, impl=impl)


def _conv1d_t_out(t_in, k, stride, pad_lo, pad_hi):
    return (t_in + pad_lo + pad_hi - k) // stride + 1


def _conv1d_impl(x, w, *, stride, pad_lo, pad_hi, impl):
    from audiogan_tpu.kernels.conv import conv1d_lowered
    return conv1d_lowered(x, w, stride, pad_lo, pad_hi, impl)


def _convt1d_impl(x, w, *, stride, pad_lo, out_len, impl):
    from audiogan_tpu.kernels.conv import convt1d_lowered
    return convt1d_lowered(x, w, stride, pad_lo, out_len, impl)


def _out_aval(prim, x, w, shape):
    """[B, T', Cout] output aval with the vma of the inputs.

    A non-empty vma (inside a vma-checked shard_map body) requires a
    sharding whose mesh knows the manual axes; x's own sharding is that
    context (its spec is rank-3 all-None under full-manual shard_map).
    Outside shard_map the vma union is empty and the default sharding
    applies, matching the pre-vma behavior.
    """
    vma = standard_vma_rule(prim.name, x, w)
    if vma:
        return ShapedArray(shape, x.dtype, vma=vma, sharding=x.sharding)
    return ShapedArray(shape, x.dtype)


def _conv1d_abstract(x, w, *, stride, pad_lo, pad_hi, impl):
    b, t_in, cin = x.shape
    k, cin2, cout = w.shape
    assert cin == cin2, (x.shape, w.shape)
    t_out = _conv1d_t_out(t_in, k, stride, pad_lo, pad_hi)
    return _out_aval(conv1d_p, x, w, (b, t_out, cout))


def _convt1d_abstract(x, w, *, stride, pad_lo, out_len, impl):
    b, t_in, cin = x.shape
    k, cin2, cout = w.shape
    assert cin == cin2, (x.shape, w.shape)
    return _out_aval(convt1d_p, x, w, (b, out_len, cout))


conv1d_p.def_abstract_eval(_conv1d_abstract)
convt1d_p.def_abstract_eval(_convt1d_abstract)


def _eager_impl(body):
    # eager execution routes through the same lowering (`body`) via jit;
    # cache the jitted wrapper per static params — a fresh partial every
    # call would defeat jit's cache and recompile on every eager
    # invocation. Shared by every primitive family in this module.
    cache: dict = {}

    def impl(*args, **params):
        key = tuple(sorted(params.items()))
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = jax.jit(functools.partial(body, **params))
        return fn(*args)
    return impl


conv1d_p.def_impl(_eager_impl(_conv1d_impl))
convt1d_p.def_impl(_eager_impl(_convt1d_impl))

mlir.register_lowering(
    conv1d_p, mlir.lower_fun(_conv1d_impl, multiple_results=False))
mlir.register_lowering(
    convt1d_p, mlir.lower_fun(_convt1d_impl, multiple_results=False))


# ---------------------------------------------------------------------------
# transpose rules (bilinear: linear in x for fixed w and vice versa)
# ---------------------------------------------------------------------------

def _flip(w):
    return jnp.swapaxes(w[::-1], 1, 2)  # [K, Cout, Cin]


def _conv1d_transpose_x(ct, x, w, *, stride, pad_lo, pad_hi, impl):
    # d/dx: fractionally-strided conv of the cotangent with flipped kernel
    k = w.shape[0]
    t_in = x.aval.shape[1]
    return convt1d_prim(ct, _flip(w), stride=stride,
                        pad_lo=k - 1 - pad_lo, out_len=t_in, impl=impl)


def _conv1d_transpose_w(ct, x, w, *, stride, pad_lo, pad_hi, impl):
    # routed through the wgrad PRIMITIVE (kernels/conv.py lowerings: the
    # einsum-stack or single-conv XLA contraction form), whose own
    # transposes re-enter conv1d/convt1d — arbitrary-order AD holds
    k = w.aval.shape[0]
    dw = conv1d_wgrad_prim(x, ct, stride=stride, pad_lo=pad_lo,
                           pad_hi=pad_hi, k=k, impl=impl)
    return dw.astype(w.aval.dtype)


def _convt1d_transpose_x(ct, x, w, *, stride, pad_lo, out_len, impl):
    k = w.shape[0]
    t_in = x.aval.shape[1]
    lo = k - 1 - pad_lo
    hi = (t_in - 1) * stride + k - lo - out_len
    return conv1d_prim(ct, _flip(w), stride=stride, pad_lo=lo,
                       pad_hi=max(hi, 0), impl=impl)


def _convt1d_transpose_w(ct, x, w, *, stride, pad_lo, out_len, impl):
    # see _conv1d_transpose_w — routed through the wgrad primitive
    k = w.aval.shape[0]
    dw = convt1d_wgrad_prim(x, ct, stride=stride, pad_lo=pad_lo,
                            out_len=out_len, k=k, impl=impl)
    return dw.astype(w.aval.dtype)


ad.defbilinear(conv1d_p, _conv1d_transpose_x, _conv1d_transpose_w)
ad.defbilinear(convt1d_p, _convt1d_transpose_x, _convt1d_transpose_w)


# ---------------------------------------------------------------------------
# weight-grad primitives (VERDICT r2 #1b)
#
# dW is BILINEAR in (x, ct): with the trilinear form F(x, w, ct) =
# <conv(x, w), ct>, the three partial maps are conv (d/d ct), the data
# gradient (d/dx) and the weight gradient (d/dw). Registering the weight
# gradient as its own primitive keeps the hot contraction behind one
# seam — the lowering picks the XLA contraction FORM (einsum vs single
# conv, kernels/conv.py set_wgrad_form; the r4-cut Pallas stacked-row
# kernel lived behind the same seam) — while its transposes re-enter
# conv1d_prim/convt1d_prim, so gradients OF gradients (any order) stay
# inside this primitive set.
# ---------------------------------------------------------------------------

conv1d_wgrad_p = jex_core.Primitive("audiogan_conv1d_wgrad")
convt1d_wgrad_p = jex_core.Primitive("audiogan_convt1d_wgrad")


def conv1d_wgrad_prim(x, ct, stride: int, pad_lo: int, pad_hi: int,
                      k: int, impl: str = "pallas"):
    x, ct = standard_insert_pvary(x, ct)
    return conv1d_wgrad_p.bind(x, ct, stride=stride, pad_lo=pad_lo,
                               pad_hi=pad_hi, k=k, impl=impl)


def convt1d_wgrad_prim(x, ct, stride: int, pad_lo: int, out_len: int,
                       k: int, impl: str = "pallas"):
    x, ct = standard_insert_pvary(x, ct)
    return convt1d_wgrad_p.bind(x, ct, stride=stride, pad_lo=pad_lo,
                                out_len=out_len, k=k, impl=impl)


def _conv1d_wgrad_impl(x, ct, *, stride, pad_lo, pad_hi, k, impl):
    from audiogan_tpu.kernels.conv import conv1d_wgrad_lowered
    return conv1d_wgrad_lowered(x, ct, stride, pad_lo, pad_hi, k, impl)


def _convt1d_wgrad_impl(x, ct, *, stride, pad_lo, out_len, k, impl):
    from audiogan_tpu.kernels.conv import convt1d_wgrad_lowered
    return convt1d_wgrad_lowered(x, ct, stride, pad_lo, out_len, k, impl)


def _wgrad_out_aval(prim, x, ct, k):
    cin, cout = x.shape[-1], ct.shape[-1]
    vma = standard_vma_rule(prim.name, x, ct)
    if vma:
        return ShapedArray((k, cin, cout), x.dtype, vma=vma,
                           sharding=x.sharding)
    return ShapedArray((k, cin, cout), x.dtype)


def _conv1d_wgrad_abstract(x, ct, *, stride, pad_lo, pad_hi, k, impl):
    assert x.shape[0] == ct.shape[0], (x.shape, ct.shape)
    return _wgrad_out_aval(conv1d_wgrad_p, x, ct, k)


def _convt1d_wgrad_abstract(x, ct, *, stride, pad_lo, out_len, k, impl):
    assert x.shape[0] == ct.shape[0], (x.shape, ct.shape)
    return _wgrad_out_aval(convt1d_wgrad_p, x, ct, k)


conv1d_wgrad_p.def_abstract_eval(_conv1d_wgrad_abstract)
convt1d_wgrad_p.def_abstract_eval(_convt1d_wgrad_abstract)
conv1d_wgrad_p.def_impl(_eager_impl(_conv1d_wgrad_impl))
convt1d_wgrad_p.def_impl(_eager_impl(_convt1d_wgrad_impl))

mlir.register_lowering(
    conv1d_wgrad_p, mlir.lower_fun(_conv1d_wgrad_impl,
                                   multiple_results=False))
mlir.register_lowering(
    convt1d_wgrad_p, mlir.lower_fun(_convt1d_wgrad_impl,
                                    multiple_results=False))


def _conv1d_wgrad_transpose_x(g, x, ct, *, stride, pad_lo, pad_hi, k,
                              impl):
    # dF/dx with w := g — exactly _conv1d_transpose_x's convt form
    t_in = x.aval.shape[1]
    return convt1d_prim(ct, _flip(g.astype(ct.dtype)), stride=stride,
                        pad_lo=k - 1 - pad_lo, out_len=t_in, impl=impl)


def _conv1d_wgrad_transpose_ct(g, x, ct, *, stride, pad_lo, pad_hi, k,
                               impl):
    # dF/d ct with w := g — the forward conv
    return conv1d_prim(x, g.astype(x.dtype), stride=stride, pad_lo=pad_lo,
                       pad_hi=pad_hi, impl=impl)


def _convt1d_wgrad_transpose_x(g, x, ct, *, stride, pad_lo, out_len, k,
                               impl):
    t_in = x.aval.shape[1]
    lo = k - 1 - pad_lo
    hi = (t_in - 1) * stride + k - lo - out_len
    return conv1d_prim(ct, _flip(g.astype(ct.dtype)), stride=stride,
                       pad_lo=lo, pad_hi=max(hi, 0), impl=impl)


def _convt1d_wgrad_transpose_ct(g, x, ct, *, stride, pad_lo, out_len, k,
                                impl):
    return convt1d_prim(x, g.astype(x.dtype), stride=stride, pad_lo=pad_lo,
                        out_len=out_len, impl=impl)


ad.defbilinear(conv1d_wgrad_p, _conv1d_wgrad_transpose_x,
               _conv1d_wgrad_transpose_ct)
ad.defbilinear(convt1d_wgrad_p, _convt1d_wgrad_transpose_x,
               _convt1d_wgrad_transpose_ct)


def _wgrad_batch_rule(prim):
    # defensive (the training path reaches wgrad only inside lax.map /
    # scan transposes, never vmap): evaluate per-slice under lax.map
    def rule(args, dims, **params):
        x, ct = args
        dx, dct = dims
        if dx is None:
            x = jnp.broadcast_to(x[None], (ct.shape[dct],) + x.shape)
            dx = 0
        if dct is None:
            ct = jnp.broadcast_to(ct[None], (x.shape[dx],) + ct.shape)
            dct = 0
        x = jnp.moveaxis(x, dx, 0)
        ct = jnp.moveaxis(ct, dct, 0)
        out = jax.lax.map(
            lambda xc: prim.bind(xc[0], xc[1], **params), (x, ct))
        return out, 0
    return rule


batching.primitive_batchers[conv1d_wgrad_p] = _wgrad_batch_rule(
    conv1d_wgrad_p)
batching.primitive_batchers[convt1d_wgrad_p] = _wgrad_batch_rule(
    convt1d_wgrad_p)


# ---------------------------------------------------------------------------
# batching (vmap): collapse the mapped axis into the batch dim
# ---------------------------------------------------------------------------

def _batch_rule(prim):
    def rule(args, dims, **params):
        x, w = args
        dx, dw = dims
        if dw is not None:
            raise NotImplementedError(
                f"vmap over {prim.name} weights is not supported")
        x = jnp.moveaxis(x, dx, 0)
        v, b, t, c = x.shape
        out = prim.bind(x.reshape(v * b, t, c), w, **params)
        return out.reshape(v, b, *out.shape[1:]), 0
    return rule


batching.primitive_batchers[conv1d_p] = _batch_rule(conv1d_p)
batching.primitive_batchers[convt1d_p] = _batch_rule(convt1d_p)


# ---------------------------------------------------------------------------
# fused bias+activation primitives (VERDICT r2 #1a)
#
# y = act(conv(x, w) + b) with the epilogue fused into the Pallas kernel's
# final accumulator write. The primitive is NONLINEAR, so instead of
# transpose rules it gets a JVP rule whose tangent is rebuilt from the
# bilinear conv primitives above — every reverse/reverse-over-reverse pass
# (the WGAN-GP path) therefore transposes through OUR conv rules, while the
# primal forward stays one fused kernel. The activation derivative is
# recovered from the OUTPUT (leaky_relu' = where(y>=0, 1, slope);
# relu' = (y>0); tanh' = 1-y^2), so no pre-activation residual exists.
# ---------------------------------------------------------------------------

conv1d_ba_p = jex_core.Primitive("audiogan_conv1d_ba")
convt1d_ba_p = jex_core.Primitive("audiogan_convt1d_ba")


def conv1d_ba_prim(x, w, b, stride: int, pad_lo: int, pad_hi: int,
                   act: str = "none", slope: float = 0.2,
                   impl: str = "pallas"):
    x, w, b = standard_insert_pvary(x, w, b)
    return conv1d_ba_p.bind(x, w, b, stride=stride, pad_lo=pad_lo,
                            pad_hi=pad_hi, act=act, slope=slope, impl=impl)


def convt1d_ba_prim(x, w, b, stride: int, pad_lo: int, out_len: int,
                    act: str = "none", slope: float = 0.2,
                    impl: str = "pallas"):
    x, w, b = standard_insert_pvary(x, w, b)
    return convt1d_ba_p.bind(x, w, b, stride=stride, pad_lo=pad_lo,
                             out_len=out_len, act=act, slope=slope,
                             impl=impl)


def _conv1d_ba_impl(x, w, b, *, stride, pad_lo, pad_hi, act, slope, impl):
    from audiogan_tpu.kernels.conv import conv1d_ba_lowered
    return conv1d_ba_lowered(x, w, b, stride, pad_lo, pad_hi, act, slope,
                             impl)


def _convt1d_ba_impl(x, w, b, *, stride, pad_lo, out_len, act, slope, impl):
    from audiogan_tpu.kernels.conv import convt1d_ba_lowered
    return convt1d_ba_lowered(x, w, b, stride, pad_lo, out_len, act, slope,
                              impl)


def _ba_out_aval(prim, x, w, b, shape):
    vma = standard_vma_rule(prim.name, x, w, b)
    if vma:
        return ShapedArray(shape, x.dtype, vma=vma, sharding=x.sharding)
    return ShapedArray(shape, x.dtype)


def _conv1d_ba_abstract(x, w, b, *, stride, pad_lo, pad_hi, act, slope,
                        impl):
    bsz, t_in, cin = x.shape
    k, cin2, cout = w.shape
    assert cin == cin2 and b.shape == (cout,), (x.shape, w.shape, b.shape)
    t_out = _conv1d_t_out(t_in, k, stride, pad_lo, pad_hi)
    return _ba_out_aval(conv1d_ba_p, x, w, b, (bsz, t_out, cout))


def _convt1d_ba_abstract(x, w, b, *, stride, pad_lo, out_len, act, slope,
                         impl):
    bsz, t_in, cin = x.shape
    k, cin2, cout = w.shape
    assert cin == cin2 and b.shape == (cout,), (x.shape, w.shape, b.shape)
    return _ba_out_aval(convt1d_ba_p, x, w, b, (bsz, out_len, cout))


conv1d_ba_p.def_abstract_eval(_conv1d_ba_abstract)
convt1d_ba_p.def_abstract_eval(_convt1d_ba_abstract)
conv1d_ba_p.def_impl(_eager_impl(_conv1d_ba_impl))
convt1d_ba_p.def_impl(_eager_impl(_convt1d_ba_impl))

mlir.register_lowering(
    conv1d_ba_p, mlir.lower_fun(_conv1d_ba_impl, multiple_results=False))
mlir.register_lowering(
    convt1d_ba_p, mlir.lower_fun(_convt1d_ba_impl, multiple_results=False))


def _act_out_grad(y, act: str, slope: float):
    """d act/d pre as a function of the OUTPUT y (valid for monotone acts
    whose derivative is recoverable from the output; gradient-at-0
    conventions match jax.nn: relu' = (x>0), leaky_relu'(0) = 1)."""
    if act == "relu":
        return (y > 0).astype(y.dtype)
    if act == "leaky_relu":
        return jnp.where(y >= 0, jnp.ones((), y.dtype),
                         jnp.asarray(slope, y.dtype))
    if act == "tanh":
        return (1.0 - y * y).astype(y.dtype)
    assert act == "none", act
    return None


def _ba_jvp(primals, tangents, *, bind_ba, bind_lin, act, slope, impl,
            **geom):
    x, w, b = primals
    dx, dw, db = tangents
    y = bind_ba(x, w, b, act=act, slope=slope, impl=impl, **geom)
    dpre = None
    if type(dx) is not ad.Zero:
        dpre = bind_lin(dx, w, impl=impl, **geom)
    if type(dw) is not ad.Zero:
        t = bind_lin(x, dw, impl=impl, **geom)
        dpre = t if dpre is None else dpre + t
    if type(db) is not ad.Zero:
        t = jnp.broadcast_to(db.astype(y.dtype), y.shape)
        dpre = t if dpre is None else dpre + t
    if dpre is None:
        return y, ad.Zero.from_primal_value(y)
    g = _act_out_grad(y, act, slope)
    return y, dpre if g is None else g * dpre


ad.primitive_jvps[conv1d_ba_p] = functools.partial(
    _ba_jvp, bind_ba=conv1d_ba_prim, bind_lin=conv1d_prim)
ad.primitive_jvps[convt1d_ba_p] = functools.partial(
    _ba_jvp, bind_ba=convt1d_ba_prim, bind_lin=convt1d_prim)


def _ba_batch_rule(prim):
    def rule(args, dims, **params):
        x, w, b = args
        dx, dw, db = dims
        if dw is not None or db is not None:
            raise NotImplementedError(
                f"vmap over {prim.name} weights/bias is not supported")
        x = jnp.moveaxis(x, dx, 0)
        v, bsz, t, c = x.shape
        out = prim.bind(x.reshape(v * bsz, t, c), w, b, **params)
        return out.reshape(v, bsz, *out.shape[1:]), 0
    return rule


batching.primitive_batchers[conv1d_ba_p] = _ba_batch_rule(conv1d_ba_p)
batching.primitive_batchers[convt1d_ba_p] = _ba_batch_rule(convt1d_ba_p)


# ---------------------------------------------------------------------------
# shuffled-input conv primitives (VERDICT r3 #1 — kernels/sconv.py)
#
# sconv1d(xp, w, offs)    = conv1d(window_select(xp, offs), w)
# sconv1d_ba(xp, w, b, offs) adds the fused bias+act epilogue
# sconvt1d(ct, wf, offs)  = window_place(convt1d(ct, wf), offs)
#
# xp is the reflect-padded + per-example-masked activation (built by the
# caller with sconv.mask_reflect_pad — plain jnp, auto-transposable); offs
# [B] int32 is data-independent (non-differentiable operand). The family
# is closed under transposition:
#
#   transpose_x(sconv1d)   = sconvt1d (flipped kernel)      — select-free
#   transpose_ct(sconvt1d) = sconv1d  (flipped kernel)      — select-free
#   transpose_w(either)    = wgrad primitive on window_select(residual)
#                            (the slot-scatter dual of the weight-shift
#                            identity has no cheap contraction form, so
#                            ONLY the weight gradient keeps a select)
#
# so the GP double-backprop's x-gradient chain — the dominant shuffle cost
# — never materializes a shuffle, to any differentiation order.
# ---------------------------------------------------------------------------

sconv1d_p = jex_core.Primitive("audiogan_sconv1d")
sconv1d_ba_p = jex_core.Primitive("audiogan_sconv1d_ba")
sconvt1d_p = jex_core.Primitive("audiogan_sconvt1d")


def sconv1d_prim(xp, w, offs, stride: int, pad_lo: int, pad_hi: int,
                 rad: int, impl: str = "pallas"):
    xp, w, offs = standard_insert_pvary(xp, w, offs)
    return sconv1d_p.bind(xp, w, offs, stride=stride, pad_lo=pad_lo,
                          pad_hi=pad_hi, rad=rad, impl=impl)


def sconv1d_ba_prim(xp, w, b, offs, stride: int, pad_lo: int, pad_hi: int,
                    rad: int, act: str = "none", slope: float = 0.2,
                    impl: str = "pallas"):
    xp, w, b, offs = standard_insert_pvary(xp, w, b, offs)
    return sconv1d_ba_p.bind(xp, w, b, offs, stride=stride, pad_lo=pad_lo,
                             pad_hi=pad_hi, rad=rad, act=act, slope=slope,
                             impl=impl)


def sconvt1d_prim(ct, wf, offs, stride: int, pad_lo_t: int, t: int,
                  rad: int, impl: str = "pallas"):
    ct, wf, offs = standard_insert_pvary(ct, wf, offs)
    return sconvt1d_p.bind(ct, wf, offs, stride=stride, pad_lo_t=pad_lo_t,
                           t=t, rad=rad, impl=impl)


def _sconv1d_impl(xp, w, offs, *, stride, pad_lo, pad_hi, rad, impl):
    from audiogan_tpu.kernels.sconv import sconv1d_lowered
    return sconv1d_lowered(xp, w, offs, stride, pad_lo, pad_hi, rad, impl)


def _sconv1d_ba_impl(xp, w, b, offs, *, stride, pad_lo, pad_hi, rad, act,
                     slope, impl):
    from audiogan_tpu.kernels.sconv import sconv1d_ba_lowered
    return sconv1d_ba_lowered(xp, w, b, offs, stride, pad_lo, pad_hi, rad,
                              act, slope, impl)


def _sconvt1d_impl(ct, wf, offs, *, stride, pad_lo_t, t, rad, impl):
    from audiogan_tpu.kernels.sconv import sconvt1d_lowered
    return sconvt1d_lowered(ct, wf, offs, stride, pad_lo_t, t, rad, impl)


def _sconv_out_aval(prim, args, shape, dtype):
    vma = standard_vma_rule(prim.name, *args)
    if vma:
        return ShapedArray(shape, dtype, vma=vma, sharding=args[0].sharding)
    return ShapedArray(shape, dtype)


def _sconv1d_abstract(xp, w, offs, *, stride, pad_lo, pad_hi, rad, impl):
    b, tp, cin = xp.shape
    k, cin2, cout = w.shape
    assert cin == cin2, (xp.shape, w.shape)
    assert offs.shape == (b,), (offs.shape, b)
    t = tp - 2 * rad
    t_out = _conv1d_t_out(t, k, stride, pad_lo, pad_hi)
    return _sconv_out_aval(sconv1d_p, (xp, w, offs), (b, t_out, cout),
                           xp.dtype)


def _sconv1d_ba_abstract(xp, w, b, offs, *, stride, pad_lo, pad_hi, rad,
                         act, slope, impl):
    bsz, tp, cin = xp.shape
    k, cin2, cout = w.shape
    assert cin == cin2 and b.shape == (cout,)
    t = tp - 2 * rad
    t_out = _conv1d_t_out(t, k, stride, pad_lo, pad_hi)
    return _sconv_out_aval(sconv1d_ba_p, (xp, w, b, offs),
                           (bsz, t_out, cout), xp.dtype)


def _sconvt1d_abstract(ct, wf, offs, *, stride, pad_lo_t, t, rad, impl):
    b, t_in, cout = ct.shape
    k, cout2, cin = wf.shape
    assert cout == cout2, (ct.shape, wf.shape)
    return _sconv_out_aval(sconvt1d_p, (ct, wf, offs),
                           (b, t + 2 * rad, cin), ct.dtype)


sconv1d_p.def_abstract_eval(_sconv1d_abstract)
sconv1d_ba_p.def_abstract_eval(_sconv1d_ba_abstract)
sconvt1d_p.def_abstract_eval(_sconvt1d_abstract)

mlir.register_lowering(
    sconv1d_p, mlir.lower_fun(_sconv1d_impl, multiple_results=False))
mlir.register_lowering(
    sconv1d_ba_p, mlir.lower_fun(_sconv1d_ba_impl, multiple_results=False))
mlir.register_lowering(
    sconvt1d_p, mlir.lower_fun(_sconvt1d_impl, multiple_results=False))


sconv1d_p.def_impl(_eager_impl(_sconv1d_impl))
sconv1d_ba_p.def_impl(_eager_impl(_sconv1d_ba_impl))
sconvt1d_p.def_impl(_eager_impl(_sconvt1d_impl))


def _sconv1d_jvp(primals, tangents, **params):
    xp, w, offs = primals
    dxp, dw, _ = tangents
    y = sconv1d_prim(xp, w, offs, **params)
    dy = None
    if type(dxp) is not ad.Zero:
        dy = sconv1d_prim(dxp, w, offs, **params)
    if type(dw) is not ad.Zero:
        t = sconv1d_prim(xp, dw, offs, **params)
        dy = t if dy is None else dy + t
    if dy is None:
        dy = ad.Zero.from_primal_value(y)
    return y, dy


def _sconvt1d_jvp(primals, tangents, **params):
    ct, wf, offs = primals
    dct, dwf, _ = tangents
    y = sconvt1d_prim(ct, wf, offs, **params)
    dy = None
    if type(dct) is not ad.Zero:
        dy = sconvt1d_prim(dct, wf, offs, **params)
    if type(dwf) is not ad.Zero:
        t = sconvt1d_prim(ct, dwf, offs, **params)
        dy = t if dy is None else dy + t
    if dy is None:
        dy = ad.Zero.from_primal_value(y)
    return y, dy


def _sconv1d_transpose(ct, xp, w, offs, *, stride, pad_lo, pad_hi, rad,
                       impl):
    assert not ad.is_undefined_primal(offs), \
        "phase-shuffle offsets are not differentiable"
    k = w.aval.shape[0] if ad.is_undefined_primal(w) else w.shape[0]
    if ad.is_undefined_primal(xp):
        t = xp.aval.shape[1] - 2 * rad
        dxp = sconvt1d_prim(ct, _flip(w), offs, stride=stride,
                            pad_lo_t=k - 1 - pad_lo, t=t, rad=rad,
                            impl=impl)
        return (dxp, None, None)
    from audiogan_tpu.kernels.sconv import window_select
    t = xp.shape[1] - 2 * rad
    z = window_select(xp, offs, t, rad)
    dw = conv1d_wgrad_prim(z, ct, stride=stride, pad_lo=pad_lo,
                           pad_hi=pad_hi, k=k, impl=impl)
    return (None, dw.astype(w.aval.dtype), None)


def _sconvt1d_transpose(g, ct, wf, offs, *, stride, pad_lo_t, t, rad, impl):
    assert not ad.is_undefined_primal(offs), \
        "phase-shuffle offsets are not differentiable"
    k = wf.aval.shape[0] if ad.is_undefined_primal(wf) else wf.shape[0]
    if ad.is_undefined_primal(ct):
        t_in = ct.aval.shape[1]
        lo = k - 1 - pad_lo_t
        hi = (t_in - 1) * stride + k - lo - t
        dct = sconv1d_prim(g, _flip(wf), offs, stride=stride, pad_lo=lo,
                           pad_hi=max(hi, 0), rad=rad, impl=impl)
        return (dct, None, None)
    from audiogan_tpu.kernels.sconv import window_select
    gz = window_select(g, offs, t, rad)
    dwf = convt1d_wgrad_prim(ct, gz, stride=stride, pad_lo=pad_lo_t,
                             out_len=t, k=k, impl=impl)
    return (None, dwf.astype(wf.aval.dtype), None)


ad.primitive_jvps[sconv1d_p] = _sconv1d_jvp
ad.primitive_jvps[sconvt1d_p] = _sconvt1d_jvp
ad.primitive_transposes[sconv1d_p] = _sconv1d_transpose
ad.primitive_transposes[sconvt1d_p] = _sconvt1d_transpose


def _sconv1d_ba_jvp(primals, tangents, *, act, slope, **params):
    xp, w, b, offs = primals
    dxp, dw, db, _ = tangents
    y = sconv1d_ba_prim(xp, w, b, offs, act=act, slope=slope, **params)
    dpre = None
    if type(dxp) is not ad.Zero:
        dpre = sconv1d_prim(dxp, w, offs, **params)
    if type(dw) is not ad.Zero:
        t = sconv1d_prim(xp, dw, offs, **params)
        dpre = t if dpre is None else dpre + t
    if type(db) is not ad.Zero:
        t = jnp.broadcast_to(db.astype(y.dtype), y.shape)
        dpre = t if dpre is None else dpre + t
    if dpre is None:
        return y, ad.Zero.from_primal_value(y)
    g = _act_out_grad(y, act, slope)
    return y, dpre if g is None else g * dpre


ad.primitive_jvps[sconv1d_ba_p] = _sconv1d_ba_jvp


def _sconv_batch_rule(prim, n_tensor):
    """vmap over the batch operands (xp/ct and offs share axis 0; weights
    and bias must be unbatched): fold the vmapped axis into B."""
    def rule(args, dims, **params):
        xs, offs = args[:n_tensor], args[-1]
        ds, d_offs = dims[:n_tensor], dims[-1]
        x, w_like = xs[0], xs[1:]
        dx = ds[0]
        if any(d is not None for d in ds[1:]):
            raise NotImplementedError(
                f"vmap over {prim.name} weights/bias is not supported")
        x = jnp.moveaxis(x, dx, 0)
        v, bsz = x.shape[0], x.shape[1]
        if d_offs is None:
            offs_f = jnp.tile(offs[None], (v, 1))
        else:
            offs_f = jnp.moveaxis(offs, d_offs, 0)
        out = prim.bind(x.reshape(v * bsz, *x.shape[2:]), *w_like,
                        offs_f.reshape(v * bsz), **params)
        return out.reshape(v, bsz, *out.shape[1:]), 0
    return rule


batching.primitive_batchers[sconv1d_p] = _sconv_batch_rule(sconv1d_p, 2)
batching.primitive_batchers[sconv1d_ba_p] = _sconv_batch_rule(
    sconv1d_ba_p, 3)
batching.primitive_batchers[sconvt1d_p] = _sconv_batch_rule(sconvt1d_p, 2)
