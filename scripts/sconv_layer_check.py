"""Layer-level adjudicator for the r4 sconv_hw_check FAIL: kernel bug vs
f32-precision artifact.

Background: on TPU, XLA f32 convs run at DEFAULT matmul precision (bf16
passes — see WORKLOG "Known environment facts"), while the Pallas sconv
kernels accumulate through `jnp.dot(..., preferred_element_type=f32)`.
The step-level witness (scripts/sconv_hw_check.py) compares fused-auto
against fused-XLA and judges with a noise floor measured on the UNFUSED
auto tier — whose forward path runs no Pallas at all (the conv1d band is
empty), so its f32 score floor is 0.0 and any precision gap between the
two f32 matmul flavors reads as a kernel FAIL.

This probe settles it per layer geometry by adding a THIRD leg: the XLA
lowering under jax.default_matmul_precision('highest') (true f32 on the
MXU). For each flagship sconv-band geometry it reports

    d_pd = rel(pallas, xla_default)
    d_ph = rel(pallas, xla_highest)
    d_dh = rel(xla_default, xla_highest)   # pure precision gap

Verdict per geometry: if d_ph << d_pd ~ d_dh the kernel matches true-f32
math and the step-level gap was precision, not a bug; if d_ph ~ d_pd >>
d_dh the kernel is genuinely wrong. Covers fwd values AND the vjp (dx
rides the sconvt kernel, dw the shared XLA wgrad) at every offset value.

Run (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sconv_layer_check.py
"""

from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.kernels.conv import _same_pads
from audiogan_tpu.kernels.primitives import sconv1d_prim

# flagship critic shuffle-site geometries (k=25, s=4, rad=2) that the
# default bands route to Pallas: L1/L2 fwd+dx, L3 dx-only (m_out=64)
GEOS = [
    # (t, cin, cout, dtype)
    (4096, 64, 128, jnp.float32),
    (1024, 128, 256, jnp.float32),
    (256, 256, 512, jnp.float32),
    (4096, 64, 128, jnp.bfloat16),
    (1024, 128, 256, jnp.bfloat16),
]
K, S, RAD = 25, 4, 2
B = 8


def rel(a, b):
    num = float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                - jnp.asarray(b, jnp.float32))))
    den = float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)))) + 1e-9
    return num / den


def run_geo(t, cin, cout, dtype):
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((B, t + 2 * RAD, cin)), dtype)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) / np.sqrt(K * cin),
                    dtype)
    offs = jnp.asarray(np.arange(B) % (2 * RAD + 1), jnp.int32)
    _, lo, hi = _same_pads(t, K, S)
    ct = jnp.asarray(
        rng.standard_normal((B, (t + lo + hi - K) // S + 1, cout)), dtype)

    # inputs as jit ARGUMENTS (captured constants get constant-folded at
    # compile time — minutes per leg on the 1-core host)
    def fwd_and_dx(impl, xp_, w_, ct_):
        def f(v):
            return sconv1d_prim(v, w_, offs, stride=S, pad_lo=lo,
                                pad_hi=hi, rad=RAD, impl=impl)
        y, pull = jax.vjp(f, xp_)
        (dx,) = pull(ct_)
        return y, dx

    legs = {}
    legs["pallas"] = jax.jit(
        functools.partial(fwd_and_dx, "pallas"))(xp, w, ct)
    legs["xla_def"] = jax.jit(
        functools.partial(fwd_and_dx, "xla"))(xp, w, ct)
    with jax.default_matmul_precision("highest"):
        legs["xla_hi"] = jax.jit(
            functools.partial(fwd_and_dx, "xla"))(xp, w, ct)

    out = {}
    for part, i in (("fwd", 0), ("dx", 1)):
        out[part] = {
            "d_pd": rel(legs["pallas"][i], legs["xla_def"][i]),
            "d_ph": rel(legs["pallas"][i], legs["xla_hi"][i]),
            "d_dh": rel(legs["xla_def"][i], legs["xla_hi"][i]),
        }
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "tpu":
        # CPU smoke: interpret-mode kernels (true f32 everywhere — all
        # three legs should then agree to roundoff)
        from audiogan_tpu.kernels import conv as kc
        kc._INTERPRET = True
    bad = []
    for t, cin, cout, dtype in GEOS:
        name = f"t={t} {cin}->{cout} {jnp.dtype(dtype).name}"
        r = run_geo(t, cin, cout, dtype)
        # dtype floor: bf16 kernels round intermediates at bf16 ulp in a
        # different accumulation order than XLA — CPU interpret mode
        # (exact f32 arithmetic in both XLA legs) measures that floor at
        # 1.5e-3 fwd / 4.1e-3 dx on the largest geometry
        tol = 2e-5 if dtype == jnp.float32 else 1e-2
        for part, d in r.items():
            # kernel is exact iff it sits at/below the two XLA flavors'
            # own precision gap from true-f32 math
            exact = d["d_ph"] <= max(4 * d["d_dh"], tol) or \
                d["d_ph"] <= 0.25 * d["d_pd"]
            tag = "precision-ok" if exact else "KERNEL-BUG"
            print(f"[{name}] {part}: d_pd={d['d_pd']:.2e} "
                  f"d_ph={d['d_ph']:.2e} d_dh={d['d_dh']:.2e}  {tag}",
                  flush=True)
            if not exact:
                bad.append((name, part, d))
    if bad:
        print("sconv_layer_check: KERNEL BUG at", bad, flush=True)
        raise SystemExit(1)
    print("sconv_layer_check: all geometries precision-consistent",
          flush=True)


if __name__ == "__main__":
    main()
