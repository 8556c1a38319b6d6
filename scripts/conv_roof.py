"""Conv-lowering roof hunt (round-3 s5): where does the 4-6x between the
step's ~19 TF/s and the chip's 163.8 TF/s matmul roof go?

Hypothesis: per-grid-step overhead. A 512-row tile holds < 1 us of MXU
work at the flagship shapes, so the grid-step fixed cost (scalar core,
semaphores, DMA issue) dominates. The two levers already in conv.py are
swept here without code changes:

  AUDIOGAN_T_TILE_CAP   (default 512)  -> 1024 / 2048 row tiles
  AUDIOGAN_COLLAPSE_*   batch-collapse thresholds -> collapse everywhere
                        (one long row axis = tiles span batch elements)

Each layer geometry times, interleaved round-robin (throttle-fair):
  - xla           lax.conv tier (the auto router's current winner)
  - p<cap>[c]     pallas at tile cap <cap>, 'c' = batch-collapsed
  - gemm          the im2col-shaped GEMM with the kernel's padded FLOPs
                  (the achievable roof for this contraction shape)

Methodology: staged device-resident inputs, iterations CHAINED in-graph
(w scaled by a carry so nothing folds or CSEs; w re-layout per iteration
matches training, where w changes every step), host-fetch sync.

Run: PYTHONPATH=/root/repo python scripts/conv_roof.py [--sets flagship]
"""

from __future__ import annotations

import argparse
import pathlib
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import audiogan_tpu.kernels.conv as kc
from audiogan_tpu.ops.conv import conv1d, conv_transpose1d

B = 64
K = 25

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
MUSIC = [
    ("conv", 25200, 64, 128, 7),
    ("conv", 3600, 128, 256, 5),
    ("convt", 2352, 256, 128, 5),
    ("convt", 11760, 128, 64, 5),
]
SETS = {"flagship": FLAGSHIP, "music": MUSIC}


def chain(fn, x, w, iters):
    """Run fn(x, w*c) iters times inside one jit; carry c depends on the
    output so iterations serialize and nothing constant-folds."""
    def body(c, _):
        y = fn(x, w * c.astype(w.dtype))
        return 1.0 + 1e-20 * jnp.sum(y).astype(jnp.float32), ()
    c, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), (), length=iters)
    return c


def timeit(jfn, iters, rounds):
    _ = float(jfn())                              # warm (compiled already)
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = float(jfn())
        ts.append((time.perf_counter() - t0) / iters)
    return ts


def bench_layer(kind, t_in, cin, cout, stride, iters, rounds, caps):
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, t_in, cin)), dtype))
    w = jax.device_put(jnp.asarray(
        rng.standard_normal((K, cin, cout)) * 0.02, dtype))
    op = conv1d if kind == "conv" else conv_transpose1d
    t_out = -(-t_in // stride) if kind == "conv" else t_in * stride
    gflop = 2 * B * t_out * K * cin * cout / 1e9

    q_taps = -(-K // stride)
    if kind == "conv":
        R, Kd, N = B * t_out, q_taps * stride * cin, cout
    else:
        R, Kd, N = B * (t_in), q_taps * cin, stride * cout
    a_g = jax.device_put(jnp.asarray(
        rng.standard_normal((R, Kd)) * 0.05, dtype))
    w_g = jax.device_put(jnp.asarray(
        rng.standard_normal((Kd, N)) * 0.05, dtype))
    gemm_gflop = 2 * R * Kd * N / 1e9

    variants = {}

    def make(fn):
        j = jax.jit(partial(chain, fn, iters=iters))
        j = partial(j, x, w)
        j()                                        # compile
        return j

    variants["xla"] = make(lambda x_, w_: op(x_, w_, stride=stride,
                                             impl="xla"))
    for cap in caps:
        for collapse in (False, True):
            kc._T_TILE_CAP = cap
            kc._COLLAPSE_MAX_CONV = 10 ** 9 if collapse else 256
            kc._COLLAPSE_MAX_CONVT = 10 ** 9 if collapse else 0
            name = f"p{cap}{'c' if collapse else ''}"
            try:
                variants[name] = make(
                    lambda x_, w_: op(x_, w_, stride=stride, impl="pallas"))
            except Exception as e:  # VMEM misfit etc.
                print(f"  {name}: SKIP ({type(e).__name__}: {e})")
    kc._T_TILE_CAP = 512
    kc._COLLAPSE_MAX_CONV, kc._COLLAPSE_MAX_CONVT = 256, 0

    def gemm_chain():
        @jax.jit
        def run(a, wg):
            def body(c, _):
                y = jnp.dot(a, wg * c.astype(wg.dtype),
                            preferred_element_type=jnp.float32)
                return 1.0 + 1e-20 * jnp.sum(y), ()
            c, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), (),
                                length=iters)
            return c
        j = partial(run, a_g, w_g)
        j()
        return j

    variants["gemm"] = gemm_chain()

    # interleaved rounds: one timing of each variant per round
    times = {n: [] for n in variants}
    for r in range(rounds):
        for n, j in variants.items():
            times[n].append(timeit(j, iters, 1)[0])
    med = {n: statistics.median(ts) for n, ts in times.items()}
    print(f"{kind:5s} s={stride} T={t_in:6d} {cin:4d}->{cout:4d} "
          f"({gflop:5.1f} GF, gemm {gemm_gflop:5.1f} GF)")
    base = med["xla"]
    for n in variants:
        g = gemm_gflop if n == "gemm" else gflop
        print(f"   {n:8s} {med[n]*1e3:8.3f} ms  {g/med[n]/1e3:7.1f} TF/s  "
              f"{med[n]/base:5.2f}x xla   "
              f"rounds {[f'{t*1e3:.3f}' for t in times[n]]}")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", default="flagship")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--caps", default="512,1024,2048")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    caps = [int(c) for c in args.caps.split(",")]
    for set_name in args.sets.split(","):
        for kind, t_in, cin, cout, stride in SETS[set_name]:
            bench_layer(kind, t_in, cin, cout, stride, args.iters,
                        args.rounds, caps)


if __name__ == "__main__":
    main()
