"""Composition-level critic-path bisect: where does the pallas D tier lose?

Times, for the FULL flagship critic at batch 64 on both kernel tiers:
  fwd      D(x)
  grad_x   ∇_x D(x)           (the GP inner gradient)
  gp_loss  ∇_θ[ WGAN-D loss + 10·GP ]   (the real per-micro-step work)
Interleaved A/B per metric with within-pair ratios (throttle-fair — see
bench.py bench_compare). Run on the chip:
    python scripts/d_path_bench.py [--rounds 6]
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


def build(impl, dtype=jnp.bfloat16):
    import dataclasses

    from audiogan_tpu.config import get_preset
    from audiogan_tpu.losses import gradient_penalty, wgan_d_loss
    from audiogan_tpu.models import build_discriminator

    cfg = get_preset("wgan_gp_b64")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, kernels=impl,
                                       kernels_g="", kernels_d="",
                                       dtype="bfloat16"))
    d = build_discriminator(cfg)
    x = jax.random.normal(jax.random.key(0), (64, cfg.data.clip_len, 1),
                          dtype)
    fake = jax.random.normal(jax.random.key(1), x.shape, dtype)
    params = d.init({"params": jax.random.key(2)}, x, train=False)

    def apply(p, v):
        return d.apply(p, v, train=False)

    fwd = jax.jit(apply)

    grad_x = jax.jit(lambda p, v: jax.grad(
        lambda vv: jnp.sum(apply(p, vv)))(v))

    def d_loss(p):
        gp, _ = gradient_penalty(lambda v: apply(p, v), x, fake,
                                 jax.random.key(3))
        return wgan_d_loss(apply(p, x), apply(p, fake)) + 10.0 * gp

    gp_loss = jax.jit(jax.grad(d_loss))
    return params, x, fwd, grad_x, gp_loss


def timeit(fn, *args, iters=8):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    from audiogan_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    tiers = {}
    for impl in ("xla", "pallas"):
        params, x, fwd, grad_x, gp_loss = build(impl)
        tiers[impl] = {
            "fwd": (fwd, (params, x)),
            "grad_x": (grad_x, (params, x)),
            "gp_loss": (gp_loss, (params,)),
        }

    results = {m: {"xla": [], "pallas": []}
               for m in ("fwd", "grad_x", "gp_loss")}
    order = ["xla", "pallas"]
    for r in range(args.rounds):
        for metric in results:
            for impl in (order if r % 2 == 0 else order[::-1]):
                fn, a = tiers[impl][metric]
                results[metric][impl].append(timeit(fn, *a))
    for metric, d in results.items():
        ratios = [p / x for p, x in zip(d["pallas"], d["xla"])]
        print(f"{metric:8s} xla {statistics.median(d['xla'])*1e3:8.2f} ms  "
              f"pallas {statistics.median(d['pallas'])*1e3:8.2f} ms  "
              f"median pallas/xla time ratio "
              f"{statistics.median(ratios):.3f}")


if __name__ == "__main__":
    main()
