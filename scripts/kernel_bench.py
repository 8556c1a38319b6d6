"""Per-layer conv kernel microbench: pallas vs xla on the real chip.

Times fwd (plain + fused bias/act epilogue), the dx-only and dw-only
cotangent pulls, and the full value_and_grad for every flagship
(wgan_gp_b64) and music (music_44k_dp16, strides 7/7/5/5/3) conv layer
shape, both tiers. Host-fetch sync (the only reliable sync on axon — see
BASELINE.md). Run:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/kernel_bench.py
    ... --sets music --parts fwd,dw
"""

from __future__ import annotations

import argparse
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from audiogan_tpu.ops.conv import (conv1d, conv1d_ba, conv_transpose1d,
                                   conv_transpose1d_ba)

B = 64
K = 25

# (kind, T_in, Cin, Cout, stride); flagship = wgan_gp_b64 (stride 4).
FLAGSHIP = [
    ("conv", 4096, 64, 128, 4),
    ("conv", 1024, 128, 256, 4),
    ("conv", 256, 256, 512, 4),
    ("conv", 64, 512, 1024, 4),
    ("convt", 16, 1024, 512, 4),
    ("convt", 64, 512, 256, 4),
    ("convt", 256, 256, 128, 4),
    ("convt", 1024, 128, 64, 4),
]
# music_44k_dp16: clip 176400, D strides (7,7,5,5,3) / G the reverse walk.
# First D layer (T=176400, 1->64) and last G layer (->1) are MIN_CH-gated
# to XLA, so only the >=64-channel interior layers are listed.
MUSIC = [
    ("conv", 25200, 64, 128, 7),
    ("conv", 3600, 128, 256, 5),
    ("conv", 720, 256, 512, 5),
    ("conv", 144, 512, 1024, 3),
    ("convt", 48, 1024, 512, 7),
    ("convt", 336, 512, 256, 7),
    ("convt", 2352, 256, 128, 5),
    ("convt", 11760, 128, 64, 5),
]
SETS = {"flagship": FLAGSHIP, "music": MUSIC}


def timeit(fn, *args, iters=5):
    out = fn(*args)
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def bench_layer(kind, t_in, cin, cout, stride, impls, dtype, iters, parts):
    """Times BOTH impls back-to-back per layer+part (throttle-fair: the
    chip's clock drifts on a seconds scale, so only adjacent timings
    compare)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, t_in, cin)), dtype)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.02, dtype)
    bias = jnp.asarray(rng.standard_normal((cout,)) * 0.02, dtype)
    op = conv1d if kind == "conv" else conv_transpose1d
    op_ba = conv1d_ba if kind == "conv" else conv_transpose1d_ba

    builders = {}
    for impl in impls:
        def fwd(x, w, impl=impl):
            return op(x, w, stride=stride, impl=impl)

        def fwd_ba(x, w, bias, impl=impl):
            return op_ba(x, w, bias, stride=stride, act="leaky_relu",
                         impl=impl)

        ct = jnp.asarray(rng.standard_normal(
            jax.eval_shape(fwd, x, w).shape), dtype)

        def grad(x, w, ct, impl=impl):
            # random cotangent: grad-of-sum degenerates (ct constant-folds)
            _, vjp = jax.vjp(
                lambda x, w: op(x, w, stride=stride, impl=impl), x, w)
            return vjp(ct)

        def grad_dx(x, w, ct, impl=impl):
            _, vjp = jax.vjp(
                lambda x: op(x, w, stride=stride, impl=impl), x)
            return vjp(ct)

        def grad_dw(x, w, ct, impl=impl):
            _, vjp = jax.vjp(
                lambda w: op(x, w, stride=stride, impl=impl), w)
            return vjp(ct)

        fns = {"fwd": (fwd, (x, w)),
               "ba": (fwd_ba, (x, w, bias)),
               "grad": (grad, (x, w, ct)),
               "dx": (grad_dx, (x, w, ct)),
               "dw": (grad_dw, (x, w, ct))}
        jitted = {}
        for part in parts:
            fn, args = fns[part]
            jfn = jax.jit(fn)
            jfn(*args)                       # compile outside the window
            jitted[part] = (jfn, args)
        builders[impl] = jitted

    t_out = t_in // stride if kind == "conv" else t_in * stride
    gflop = 2 * B * t_out * K * cin * cout / 1e9
    times = {i: {} for i in impls}
    for part in parts:                       # adjacent-timing per part
        for impl in impls:
            jfn, args = builders[impl][part]
            t = timeit(jfn, *args, iters=iters)
            times[impl][part] = t
            mult = {"fwd": 1, "ba": 1, "grad": 3, "dx": 2, "dw": 2}[part]
            print(f"{kind:5s} s={stride} T={t_in:6d} {cin:4d}->{cout:4d} "
                  f"{impl:6s} {part:4s} {t*1e3:8.2f} ms "
                  f"({mult*gflop/t:6.0f} GF/s)")
    if len(impls) == 2 and "xla" in times:
        other = next(i for i in impls if i != "xla")
        rats = {p: times[other][p] / times["xla"][p] for p in parts}
        print(f"      -> {other}/xla time ratios: "
              + "  ".join(f"{p} {r:.2f}" for p, r in rats.items()))
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--dtypes", default="bfloat16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sets", default="flagship")
    ap.add_argument("--parts", default="fwd,ba,dx,dw",
                    help="comma of fwd,ba,grad,dx,dw")
    ap.add_argument("--kinds", default="conv,convt")
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    impls = args.impls.split(",")
    parts = args.parts.split(",")
    kinds = args.kinds.split(",")
    for dtype in args.dtypes.split(","):
        for set_name in args.sets.split(","):
            for kind, t_in, cin, cout, stride in SETS[set_name]:
                if kind not in kinds:
                    continue
                bench_layer(kind, t_in, cin, cout, stride, impls, dtype,
                            args.iters, parts)


if __name__ == "__main__":
    main()
