"""Probe: would concatenating the critic's real/fake passes help?

The WGAN-GP micro-step scores real and fake with two separate batch-B
critic calls (train/step.py d_loss_fn); one batch-2B call would halve
dispatches and double row occupancy in the deep small-T layers. Since
conv/dense/phase-shuffle are per-example independent, D(concat) ==
concat(D(real), D(fake)) mathematically — this probe measures whether
the fused pass is actually faster on the chip before we restructure the
step (and its cp/tp mirrors) around it.

Times, interleaved with host-fetch sync (axon: block_until_ready lies):
  two_fwd   jit(D(a) + D(b))          at batch B
  cat_fwd   jit(D(concat(a, b)))      at batch 2B
  two_vag   jit(value_and_grad of mean(D(a)) - mean(D(b)))
  cat_vag   same loss through one concat pass

Run: python scripts/concat_probe.py [--rounds 6] [--iters 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--kernels", default="auto")
    ap.add_argument("--tiny", action="store_true",
                    help="micro geometry for a CPU smoke test")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    from audiogan_tpu.config import get_preset
    from audiogan_tpu.models import build_discriminator
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_preset("wgan_gp_b64")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, kernels=args.kernels,
                                       dtype="bfloat16"))
    if args.tiny:
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, clip_len=1024,
                                     store_len=1280),
            model=dataclasses.replace(cfg.model, model_dim=4,
                                      kernel_size=9, strides=(4, 4, 4),
                                      max_channels=16),
            train=dataclasses.replace(cfg.train, batch_size=4,
                                      kernels=args.kernels,
                                      dtype="bfloat16"))
    d = build_discriminator(cfg)
    b = cfg.train.batch_size
    t = cfg.data.clip_len
    kp, ka, kb, ks = jax.random.split(jax.random.key(0), 4)
    real = jax.random.normal(ka, (b, t, 1), jnp.bfloat16)
    fake = jax.random.normal(kb, (b, t, 1), jnp.bfloat16)
    params = d.init({"params": kp, "phase_shuffle": ks}, real)

    def apply(p, x, key):
        return d.apply(p, x, train=True, rngs={"phase_shuffle": key})

    k1, k2 = jax.random.split(ks)

    @jax.jit
    def two_fwd(p, a, bb):
        return jnp.mean(apply(p, a, k1)) - jnp.mean(apply(p, bb, k2))

    @jax.jit
    def cat_fwd(p, a, bb):
        s = apply(p, jnp.concatenate([a, bb], axis=0), k1)
        return jnp.mean(s[:b]) - jnp.mean(s[b:])

    two_vag = jax.jit(jax.value_and_grad(two_fwd))
    cat_vag = jax.jit(jax.value_and_grad(cat_fwd))

    def run_fwd(fn):
        out = fn(params, real, fake)
        return float(out)

    def run_vag(fn):
        out, _ = fn(params, real, fake)
        return float(out)

    cases = {
        "two_fwd": lambda: run_fwd(two_fwd),
        "cat_fwd": lambda: run_fwd(cat_fwd),
        "two_vag": lambda: run_vag(two_vag),
        "cat_vag": lambda: run_vag(cat_vag),
    }
    for name, fn in cases.items():
        t0 = time.perf_counter()
        fn()
        fn()
        print(f"{name}: compiled+warm {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {k: [] for k in cases}
    names = list(cases)
    for r in range(args.rounds):
        order = names[r % len(names):] + names[:r % len(names)]
        for name in order:
            fn = cases[name]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                fn()
            dt = (time.perf_counter() - t0) / args.iters
            times[name].append(dt)
            print(f"  round {r} {name}: {dt*1e3:.2f} ms/call", flush=True)

    print(f"\nkernels={args.kernels} medians (ms/call):")
    med = {k: statistics.median(v) for k, v in times.items()}
    for k, v in med.items():
        print(f"  {k}: {v*1e3:.2f}")
    print(f"cat/two fwd ratio: {med['cat_fwd']/med['two_fwd']:.3f}  "
          f"vag ratio: {med['cat_vag']/med['two_vag']:.3f} "
          f"(<1.0 = concat wins)")


if __name__ == "__main__":
    main()
