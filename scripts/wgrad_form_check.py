"""On-HW witness + micro A/B for the wgrad contraction forms (r3s9).

The conv form (_conv1d_wgrad_conv / _convt1d_wgrad_conv) replaces the
phase-grouped einsum stack with ONE conv_general_dilated using
batch=channels dimension numbers and rhs_dilation=stride. Two questions:

1. VALUE: does it compile correctly on this platform? (The lhs_dilation
   miscompile precedent means every new conv dimension-number pattern
   gets a compiled-on-HW witness before shipping — vs the einsum form,
   f32 AND bf16, every flagship + music wgrad geometry.)
2. SPEED: chained in-graph micro A/B per geometry (conv_roof.py
   methodology: device-resident operands, carry-serialized iterations,
   host-fetch sync), einsum vs conv form, f32 accumulate both.

Run: PYTHONPATH=/root/repo python scripts/wgrad_form_check.py
"""

from __future__ import annotations

import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import audiogan_tpu.kernels.conv as kc

B = 64
K = 25

# (kind, t_in_rows, cin, cout, stride) — conv rows are the conv layer's
# INPUT length, convt rows are its input length m (out_len = m*s).
GEOS = [
    ("conv", 16384, 64, 128, 4),
    ("conv", 4096, 128, 256, 4),
    ("conv", 1024, 256, 512, 4),
    ("conv", 256, 512, 1024, 4),
    ("convt", 16, 1024, 512, 4),
    ("convt", 64, 512, 256, 4),
    ("convt", 256, 256, 128, 4),
    ("convt", 1024, 128, 64, 4),
    ("conv", 25200, 64, 128, 7),
    ("convt", 2352, 256, 128, 5),
]


def build(kind, t_in, cin, cout, s, dtype, rng):
    x = jax.device_put(jnp.asarray(rng.standard_normal((B, t_in, cin)),
                                   dtype))
    if kind == "conv":
        t_out, pad_lo, _ = kc._same_pads(t_in, K, s)
        ct = jax.device_put(jnp.asarray(
            rng.standard_normal((B, t_out, cout)), dtype))
        fns = {"einsum": lambda x, ct: kc._conv1d_wgrad_einsum(
                   x, ct, s, pad_lo, K),
               "conv": lambda x, ct: kc._conv1d_wgrad_conv(
                   x, ct, s, pad_lo, K)}
    else:
        out_len, pad_lo = t_in * s, (K - 1) // 2
        ct = jax.device_put(jnp.asarray(
            rng.standard_normal((B, out_len, cout)), dtype))
        fns = {"einsum": lambda x, ct: kc._convt1d_wgrad_einsum(
                   x, ct, s, pad_lo, out_len, K),
               "conv": lambda x, ct: kc._convt1d_wgrad_conv(
                   x, ct, s, pad_lo, out_len, K)}
    return x, ct, fns


def value_check():
    rng = np.random.default_rng(0)
    worst = 0.0
    for dtype, tol in ((jnp.float32, 3e-4), (jnp.bfloat16, 3e-2)):
        for geo in GEOS:
            x, ct, fns = build(*geo, dtype, rng)
            want = np.asarray(jax.jit(fns["einsum"])(x, ct))
            got = np.asarray(jax.jit(fns["conv"])(x, ct))
            scale = np.abs(want).max() + 1e-9
            err = np.abs(got - want).max() / scale
            worst = max(worst, err if dtype == jnp.float32 else 0.0)
            status = "PASS" if err <= tol else "FAIL"
            print(f"value {geo} {dtype.__name__}: rel {err:.2e} {status}",
                  flush=True)
            if err > tol:
                print("MISCOMPILE-CLASS FAILURE — do not ship the conv "
                      "form", flush=True)
                sys.exit(1)
    print(f"value check PASS (worst f32 rel {worst:.2e})", flush=True)


def chain(fn, x, ct, iters):
    def body(c, _):
        y = fn(x, ct * c.astype(ct.dtype))
        return 1.0 + 1e-20 * jnp.sum(y).astype(jnp.float32), ()
    c, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), (), length=iters)
    return c


def speed_ab(iters=30, rounds=5):
    rng = np.random.default_rng(1)
    for geo in GEOS:
        x, ct, fns = build(*geo, jnp.bfloat16, rng)
        jits = {n: jax.jit(lambda x, ct, f=f: chain(f, x, ct, iters))
                for n, f in fns.items()}
        for j in jits.values():
            _ = float(j(x, ct))                      # compile+warm
        times = {n: [] for n in jits}
        for r in range(rounds):
            order = list(jits) if r % 2 == 0 else list(jits)[::-1]
            for n in order:
                t0 = time.perf_counter()
                _ = float(jits[n](x, ct))
                times[n].append((time.perf_counter() - t0) / iters * 1e3)
        med = {n: statistics.median(ts) for n, ts in times.items()}
        print(f"speed {geo}: einsum {med['einsum']:.3f} ms  "
              f"conv {med['conv']:.3f} ms  "
              f"ratio conv/einsum {med['conv'] / med['einsum']:.3f}",
              flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    value_check()
    speed_ab()


if __name__ == "__main__":
    main()
