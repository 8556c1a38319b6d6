"""Single-chip music-preset step tuning (VERDICT r2 #2): times the
music_44k_dp16 preset at dp=1 / batch 64 (the BASELINE.md comparison
config, r2: 0.287 steps/s) across kernel tier x gp_batch_chunks x remat,
interleaved within rounds so the chip's throttle drift cancels.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/music_bench.py \
        [--configs xla:1:1,auto:1:1,xla:4:1,auto:4:1] [--rounds 3] [--steps 3]

Config spec: <kernels>:<gp_batch_chunks>:<remat(0|1)>[:<scan_unroll>].
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="xla:1:1,auto:1:1,xla:4:1,auto:4:1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    import dataclasses

    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import MeshCfg, get_preset
    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step, num_views
    from audiogan_tpu.utils.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    runs = {}
    for spec in args.configs.split(","):
        kern, chunks, remat, *rest = spec.split(":")
        unroll = rest[0] if rest else "1"
        cfg = get_preset("music_44k_dp16")
        cfg = dataclasses.replace(cfg, mesh=MeshCfg(dp=1, cp=1))
        cfg = apply_overrides(cfg, [
            f"train.dtype={args.dtype}",
            f"train.batch_size={args.batch}",
            f"train.kernels={kern}", "train.kernels_g=",
            "train.kernels_d=",
            f"loss.gp_batch_chunks={chunks}",
            f"train.remat_discriminator={'true' if remat == '1' else 'false'}",
            f"train.scan_unroll={unroll}",
        ])
        state = create_train_state(cfg)
        step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
        rng = np.random.default_rng(0)
        n = num_views(cfg)
        clips = (rng.standard_normal(
            (n, cfg.train.batch_size, cfg.data.store_len)) * 8000
        ).clip(-32768, 32767).astype(np.int16)
        labels = rng.integers(0, 1, size=(n, cfg.train.batch_size)
                              ).astype(np.int32)
        # stage ONCE on device (music re-pays ~113 MB/step otherwise —
        # the bench.py input-transfer discovery, 2026-08-18)
        clips, labels = jax.device_put(clips), jax.device_put(labels)
        t0 = time.perf_counter()
        state, metrics = step(state, clips, labels)
        float(metrics["d_loss"])
        print(f"{spec}: compiled+step1 in {time.perf_counter()-t0:.1f}s",
              flush=True)
        runs[spec] = [step, state, clips, labels, []]

    order0 = list(runs)
    for r in range(args.rounds):
        order = order0[r % len(order0):] + order0[:r % len(order0)]
        for spec in order:
            rec = runs[spec]
            step, state, clips, labels, times = rec
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = step(state, clips, labels)
            float(metrics["d_loss"])
            times.append(args.steps / (time.perf_counter() - t0))
            rec[1] = state
            print(f"  round {r} {spec}: {times[-1]:.4f} steps/s", flush=True)

    for spec, rec in runs.items():
        med = statistics.median(rec[4])
        print(f"{spec}: median {med:.4f} steps/s  rounds "
              f"{[round(x, 4) for x in rec[4]]}", flush=True)


if __name__ == "__main__":
    main()
