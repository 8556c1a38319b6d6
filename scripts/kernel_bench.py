"""Per-layer conv kernel microbench: pallas vs xla on the real chip.

Times fwd and value_and_grad for every flagship (wgan_gp_b64) conv layer
shape, both tiers, both dtypes. Host-fetch sync (the only reliable sync on
axon — see BASELINE.md). Run:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/kernel_bench.py
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

from audiogan_tpu.ops.conv import conv1d, conv_transpose1d

B = 64
K = 25
S = 4
D_LAYERS = [  # (T_in, Cin, Cout)
    (4096, 64, 128),
    (1024, 128, 256),
    (256, 256, 512),
    (64, 512, 1024),
]
G_LAYERS = [  # (T_in, Cin, Cout)
    (16, 1024, 512),
    (64, 512, 256),
    (256, 256, 128),
    (1024, 128, 64),
    (4096, 64, 1),
]


def timeit(fn, *args, iters=5):
    out = fn(*args)
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def bench_layer(kind, t_in, cin, cout, impls, dtype, iters):
    """Times BOTH impls back-to-back per layer (throttle-fair: the chip's
    clock drifts on a seconds scale, so only adjacent timings compare)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, t_in, cin)), dtype)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.02, dtype)
    op = conv1d if kind == "conv" else conv_transpose1d

    res = {}
    for impl in impls:
        @jax.jit
        def fwd(x, w, impl=impl):
            return op(x, w, stride=S, impl=impl)

        ct = jnp.asarray(rng.standard_normal(
            jax.eval_shape(fwd, x, w).shape), dtype)

        @jax.jit
        def grad(x, w, ct, impl=impl):
            # random cotangent: grad-of-sum degenerates (ct constant-folds)
            _, vjp = jax.vjp(
                lambda x, w: op(x, w, stride=S, impl=impl), x, w)
            return vjp(ct)

        fwd(x, w); grad(x, w, ct)            # compile outside the window
        res[impl] = (fwd, grad, ct)

    t_out = t_in // S if kind == "conv" else t_in * S
    gflop = 2 * B * t_out * K * cin * cout / 1e9
    times = {}
    for impl, (fwd, grad, ct) in res.items():
        t_f = timeit(fwd, x, w, iters=iters)
        t_g = timeit(grad, x, w, ct, iters=iters)
        times[impl] = (t_f, t_g)
        print(f"{kind:5s} T={t_in:6d} {cin:4d}->{cout:4d} {impl:6s} "
              f"{dtype:8s} fwd {t_f*1e3:8.2f} ms ({gflop/t_f:6.0f} GF/s)  "
              f"grad {t_g*1e3:8.2f} ms ({3*gflop/t_g:6.0f} GF/s)")
    if len(times) == 2 and "xla" in times:
        other = next(i for i in times if i != "xla")
        rf = times[other][0] / times["xla"][0]
        rg = times[other][1] / times["xla"][1]
        print(f"      -> {other}/xla time ratio: fwd {rf:.2f}  grad {rg:.2f}"
              f"  ({'WIN' if max(rf, rg) < 1 else 'win' if min(rf, rg) < 1 else 'loss'})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--dtypes", default="bfloat16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--kinds", default="conv,convt")
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    impls = args.impls.split(",")
    for dtype in args.dtypes.split(","):
        if "conv" in args.kinds.split(","):
            for t_in, cin, cout in D_LAYERS:
                bench_layer("conv", t_in, cin, cout, impls, dtype,
                            args.iters)
        if "convt" in args.kinds.split(","):
            for t_in, cin, cout in G_LAYERS:
                bench_layer("convt", t_in, cin, cout, impls, dtype,
                            args.iters)


if __name__ == "__main__":
    main()
