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
_SELECT_IMPL = 1

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
    xp = jnp.pad(x, ((0, 0), (rad, rad), (0, 0)), mode="reflect")
    return _apply_shifts(xp, shifts, t, rad)
