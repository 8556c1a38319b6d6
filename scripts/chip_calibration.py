"""Clean chip calibration: sustained matmul TFLOP/s with the staged
methodology (device-resident inputs, host-fetch sync, in-graph chaining).

The round-2 calibration ("bf16 matmul 1.2-4.8 TFLOP/s, the step is past
the practical roof") predates the input-transfer discovery and is
implausible now that the no-remat flagship step sustains ~19 TFLOP/s.
This re-measures the practical ceiling so the BASELINE roof claim is
honest:

  - square bf16/f32 matmuls at 2048/4096/8192, CHAIN iterations inside
    one jit (y = A @ y normalized) so dispatch/RPC cost amortizes,
  - conv-shaped GEMM (the flagship critic's biggest contraction),
  - everything staged on device first; sync = host fetch of a scalar.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/chip_calibration.py
"""

from __future__ import annotations

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnames=("iters",))
def _chain(a, y, iters):
    def body(y, _):
        y = jnp.dot(a, y, preferred_element_type=y.dtype)
        # keep magnitudes bounded without leaving the MXU regime
        y = y * (1.0 / 64.0)
        return y, ()
    y, _ = jax.lax.scan(body, y, (), length=iters)
    return y


def bench_square(n, dtype, iters, rounds):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.1, dtype)
    y = jnp.asarray(rng.standard_normal((n, n)) * 0.1, dtype)
    out = _chain(a, y, iters)
    _ = float(jnp.sum(out))                      # warm + sync
    best = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = _chain(a, y, iters)
        _ = float(jnp.sum(out))
        dt = time.perf_counter() - t0
        best.append(2 * n * n * n * iters / dt / 1e12)
    med = statistics.median(best)
    print(f"square {n}^3 {jnp.dtype(dtype).name}: "
          f"median {med:.2f} TFLOP/s  rounds {[f'{b:.2f}' for b in best]}",
          flush=True)
    return med


@partial(jax.jit, static_argnames=("iters",))
def _chain_rect(a, w, iters):
    # [R, K] @ [K, N]: conv-shaped GEMM, re-fed through a cheap rescale
    # (f32 carry — dot output is f32, so the scan carry must stay f32)
    def body(c, _):
        y = jnp.dot(a * c.astype(a.dtype), w,
                    preferred_element_type=jnp.float32)
        return jnp.max(jnp.abs(y)) * 1e-6 + 1.0, ()
    c, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), (), length=iters)
    return c


def bench_rect(r, k, n, dtype, iters, rounds, label):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((r, k)) * 0.1, dtype)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, dtype)
    _ = float(_chain_rect(a, w, iters))
    best = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = float(_chain_rect(a, w, iters))
        dt = time.perf_counter() - t0
        best.append(2 * r * k * n * iters / dt / 1e12)
    med = statistics.median(best)
    print(f"rect {label} [{r}x{k}]@[{k}x{n}] {jnp.dtype(dtype).name}: "
          f"median {med:.2f} TFLOP/s  rounds {[f'{b:.2f}' for b in best]}",
          flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    for n in (2048, 4096, 8192):
        bench_square(n, jnp.bfloat16, args.iters, args.rounds)
    bench_square(4096, jnp.float32, max(args.iters // 4, 8), args.rounds)
    # flagship critic L2 as an im2col GEMM: rows = B*t_out = 64*1024,
    # K = q_taps*s*cin = 7*4*128 (phase-grouped), N = 256
    bench_rect(64 * 1024, 7 * 4 * 128, 256, jnp.bfloat16,
               args.iters, args.rounds, "critic-L2")
    # generator widest convT contraction
    bench_rect(64 * 1024, 128, 7 * 4 * 64, jnp.bfloat16,
               args.iters, args.rounds, "gen-L4")


if __name__ == "__main__":
    main()
