"""Phase shuffle (SURVEY C10; WaveGAN regularizer, Donahue et al. 2019).

Random per-example circular-ish time shift by n in [-rad, rad] applied to D's
intermediate activations, with reflection padding at the exposed edge. The
shift amount is data-independent, so the op is differentiable w.r.t. x (the
gradient is the same gather transposed) — required because phase shuffle sits
inside D on the gradient-penalty double-backprop path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

# 1 (default) = select-over-(2·rad+1)-static-slices formulation. The vmap'd
# dynamic_slice alternative (=0) lowers to an XLA gather whose vjp is a
# scatter-add; on TPU those run on the scalar/vector path and together ate
# 24% of flagship step device time (r3s6b profile: scatter-add 17.0% +
# gather 7.1%). The select form is 2·rad+1 static slices blended by exact
# 0/1 masks — pure streaming VPU work that XLA fuses, at the cost of
# (2·rad+1)x read amplification; its vjp is masked adds, no scatter.
# Measured +15.8% flagship step rate (step_ab shufsel 10.29 vs 8.88
# steps/s, r3s6b 2026-08-18). Values are EXACTLY equal (one term is
# selected, the rest add 0.0), incl. 1st/2nd-order gradients — pinned by
# tests/ops/test_phase_shuffle.py. Module-global int so step-level A/Bs
# can flip it per-variant (scripts/step_ab.py gvar: syntax).
#
# 2 (round 5) = the same select-form VALUES behind a closed linear
# primitive pair (pshuf/pshuft below) whose transpose is hand-written:
# AD of form 1 builds the x-cotangent as a chain of (2·rad+1) FULL-WIDTH
# zero-padded masked terms plus two full-width reflect-fold adds (the
# r5 glue census: 1.4-2.7 GB/step of jaxpr-level add_any writes at the
# flagship's unfused sites). The primitive's transpose emits ONE
# select-scatter write + two rad-wide edge folds instead, and re-enters
# the forward primitive under transposition so the GP double-backprop
# stays closed at any order.
_SELECT_IMPL = 1

# Named handle on the global above, mirroring kernels.conv.set_wgrad_form:
# the step builders call set_shuffle_impl(cfg.model.shuffle_impl) before
# tracing, and "" RESETS to the process default (env AUDIOGAN_SHUFFLE_IMPL,
# else "select") so one preset's choice never leaks into the next build in
# the same process (bench --preset all). All three forms are bit-identical
# through the full train step (tests/train/test_shuffle_impl.py), so this
# is a pure op-structure choice, never a math one.
_IMPL_NAMES = {"gather": 0, "select": 1, "prim": 2}


def _impl_default() -> int:
    import os
    name = os.environ.get("AUDIOGAN_SHUFFLE_IMPL", "select")
    return _IMPL_NAMES.get(name, 1)


def set_shuffle_impl(name: str) -> None:
    """Select the unfused-site shuffle lowering ("gather"|"select"|"prim").

    Affects tracing only — call before jit/lowering."""
    global _SELECT_IMPL
    if not name:
        _SELECT_IMPL = _impl_default()
        return
    if name not in _IMPL_NAMES:
        raise ValueError(
            f"shuffle_impl={name!r} not in gather|select|prim")
    _SELECT_IMPL = _IMPL_NAMES[name]

# There is deliberately NO standalone Pallas shuffle kernel (cut round 4):
# the single-HBM-pass kernel pair was bit-exact compiled on HW (values /
# vjp / 2nd-order, f32+bf16) but LOST at step level on every preset (r3s7
# interleaved A/Bs 2026-08-18: 0.951 flagship / 0.944 cond_gru / 0.965
# dual / 0.875 tiny / 0.941 music vs select) — a standalone pallas_call
# is a fusion barrier on both sides of an op XLA otherwise blends into
# the neighboring elementwise streams, and its custom-transpose vjp is
# another. The TPU-tier answer is kernels/sconv.py, which fuses the
# shuffle into the conv that CONSUMES it (ModelCfg.fused_shuffle_sites)
# instead of building a better standalone op. Code + measured reasons
# archived in attic/NOTES.md (git efd6029).
def _apply_shifts(xp: jnp.ndarray, shifts: jnp.ndarray, t: int,
                  rad: int) -> jnp.ndarray:
    """Slice [B, t+2·rad, C] -> [B, t, C] at per-example offset rad-shift.

    Shared by the unsharded op below and the CP variant
    (parallel/halo.py cp_phase_shuffle), which build the padded/extended
    input differently (reflect pad vs ppermute'd halos) but apply the
    identical per-example shift.
    """
    if _SELECT_IMPL:
        out = None
        for j in range(2 * rad + 1):             # start j ⇔ shift n = rad-j
            sel = (shifts == rad - j)[:, None, None]
            seg = lax.slice_in_dim(xp, j, j + t, axis=1)
            term = jnp.where(sel, seg, jnp.zeros((), seg.dtype))
            out = term if out is None else out + term
        return out

    c = xp.shape[-1]

    def take(clip, n):
        return lax.dynamic_slice(clip, (rad - n, 0), (t, c))

    return jax.vmap(take)(xp, shifts)


# ---------------------------------------------------------------------------
# _SELECT_IMPL=2: pshuf / pshuft primitive pair (round-5 glue lever)
#
# pshuf(x, offs)  = window-select from reflect-pad:  y[b,i] = R(x)[b, i+off_b]
# pshuft(ct, offs) = its exact adjoint:  dx = Rᵀ(place(ct, offs))
#
# Both lowerings are plain jnp (no pallas_call — the r4 lesson: a
# standalone kernel is a fusion barrier on an op XLA otherwise blends into
# the neighboring streams); the primitive boundary exists ONLY to replace
# AD's transpose expression with the fused hand form. Transposes re-enter
# each other (transpose(pshuf)=pshuft, transpose(pshuft)=pshuf), so
# reverse-over-reverse — the WGAN-GP path — composes to any order, the
# same mechanism as kernels/primitives.py's conv family.
# ---------------------------------------------------------------------------

from jax._src.core import (ShapedArray,  # noqa: E402
                           standard_insert_pvary, standard_vma_rule)

pshuf_p = jex_core.Primitive("audiogan_pshuf")
pshuft_p = jex_core.Primitive("audiogan_pshuft")


def pshuf_prim(x, offs, rad: int):
    x, offs = standard_insert_pvary(x, offs)
    return pshuf_p.bind(x, offs, rad=rad)


def pshuft_prim(ct, offs, rad: int):
    ct, offs = standard_insert_pvary(ct, offs)
    return pshuft_p.bind(ct, offs, rad=rad)


def _pshuf_impl(x, offs, *, rad):
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (rad, rad), (0, 0)), mode="reflect")
    return _apply_shifts(xp, rad - offs, t, rad)


def _pshuft_impl(ct, offs, *, rad):
    """dx = Rᵀ(Wᵀ ct): one select-scatter + rad-wide reflect edge folds.

    Wᵀ ct (the window-place) as a select over shifted slices of ONE
    zero-padded buffer: v[b, m] = ct[b, m - off_b] for m in [0, t+2·rad);
    ctp[n] = ct[n - 2·rad], so v_j = ctp[2·rad - j : 2·rad - j + t + 2·rad].
    Rᵀ folds the reflect pad back: head rows v[0:rad] add (reversed) into
    dx[1:1+rad], tail rows v[rad+t:] into dx[t-1-rad:t-1] — rad-wide
    terms, vs AD's two full-width padded add_anys.
    """
    b, t, c = ct.shape
    ctp = jnp.pad(ct, ((0, 0), (2 * rad, 2 * rad), (0, 0)))
    v = None
    for j in range(2 * rad + 1):
        sel = (offs == j)[:, None, None]
        seg = lax.slice_in_dim(ctp, 2 * rad - j, 2 * rad - j + t + 2 * rad,
                               axis=1)
        term = jnp.where(sel, seg, jnp.zeros((), seg.dtype))
        v = term if v is None else v + term
    dx = lax.slice_in_dim(v, rad, rad + t, axis=1)
    head = jnp.flip(lax.slice_in_dim(v, 0, rad, axis=1), 1)
    tail = jnp.flip(lax.slice_in_dim(v, rad + t, rad + t + rad, axis=1), 1)
    dx = dx + jnp.pad(head, ((0, 0), (1, t - rad - 1), (0, 0)))
    dx = dx + jnp.pad(tail, ((0, 0), (t - 1 - rad, 1), (0, 0)))
    return dx


def _pshuf_abstract(x, offs, *, rad):
    assert offs.shape == (x.shape[0],), (offs.shape, x.shape)
    assert x.shape[1] >= rad + 1, (x.shape, rad)
    return ShapedArray(x.shape, x.dtype,
                       vma=standard_vma_rule("pshuf", x, offs))


pshuf_p.def_abstract_eval(_pshuf_abstract)
pshuft_p.def_abstract_eval(
    lambda ct, offs, *, rad: ShapedArray(
        ct.shape, ct.dtype, vma=standard_vma_rule("pshuft", ct, offs)))

mlir.register_lowering(
    pshuf_p, mlir.lower_fun(_pshuf_impl, multiple_results=False))
mlir.register_lowering(
    pshuft_p, mlir.lower_fun(_pshuft_impl, multiple_results=False))
pshuf_p.def_impl(lambda x, offs, *, rad: jax.jit(
    _pshuf_impl, static_argnames=("rad",))(x, offs, rad=rad))
pshuft_p.def_impl(lambda ct, offs, *, rad: jax.jit(
    _pshuft_impl, static_argnames=("rad",))(ct, offs, rad=rad))


def _linear_jvp(prim_fn):
    def jvp(primals, tangents, **params):
        x, offs = primals
        dx, _ = tangents
        y = prim_fn(x, offs, **params)
        if type(dx) is ad.Zero:
            return y, ad.Zero.from_primal_value(y)
        return y, prim_fn(dx, offs, **params)
    return jvp


def _pshuf_transpose(ct, x, offs, *, rad):
    assert not ad.is_undefined_primal(offs), \
        "phase-shuffle offsets are not differentiable"
    return (pshuft_prim(ct, offs, rad=rad), None)


def _pshuft_transpose(g, ct, offs, *, rad):
    assert not ad.is_undefined_primal(offs), \
        "phase-shuffle offsets are not differentiable"
    return (pshuf_prim(g, offs, rad=rad), None)


ad.primitive_jvps[pshuf_p] = _linear_jvp(pshuf_prim)
ad.primitive_jvps[pshuft_p] = _linear_jvp(pshuft_prim)
ad.primitive_transposes[pshuf_p] = _pshuf_transpose
ad.primitive_transposes[pshuft_p] = _pshuft_transpose


def _pshuf_batch_rule(prim):
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


batching.primitive_batchers[pshuf_p] = _pshuf_batch_rule(pshuf_p)
batching.primitive_batchers[pshuft_p] = _pshuf_batch_rule(pshuft_p)


def phase_shuffle(x: jnp.ndarray, key: jax.Array, rad: int,
                  impl: str | None = None) -> jnp.ndarray:
    """Shift [B, T, C] activations by per-example n ~ U{-rad..rad} in time.

    Reflect-pad time by rad on both sides, then take the length-T window
    starting at (rad - n) per example. The window take is the gather-free
    select-over-static-slices form by default (_SELECT_IMPL above); set
    _SELECT_IMPL=0 for the vmap'd-dynamic_slice gather form (same values
    exactly).

    impl: accepted for call-site compatibility (the model's kernel tier
    threads through here) and ignored — every tier uses the select form;
    the standalone Pallas kernel was cut in round 4 (note above). The
    Pallas-tier shuffle lives in kernels/sconv.py, fused into the
    consuming conv.
    """
    del impl
    if rad == 0:
        return x
    b, t, c = x.shape
    shifts = jax.random.randint(key, (b,), -rad, rad + 1)
    if _SELECT_IMPL == 2:
        return pshuf_prim(x, (rad - shifts).astype(jnp.int32), rad=rad)
    xp = jnp.pad(x, ((0, 0), (rad, rad), (0, 0)), mode="reflect")
    return _apply_shifts(xp, shifts, t, rad)
