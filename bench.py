"""Benchmark harness (BASELINE.json metrics; SURVEY §4.7, §6).

Measures, on the current jax default device (the real TPU v5e chip under the
driver):
  1. train steps/sec on the flagship wgan_gp_b64 config [B:8]
     (batch 64, n_critic 5, 16384-sample 16 kHz clips, full fused step)
  2. generated audio-sec/sec via the jit'd sampler (1 s 16 kHz clips) [B:2]

Prints ONE JSON line. vs_baseline = our steps/sec divided by the measured
torch-CPU eager proxy (bench/proxy_torch.py; recorded in BASELINE.md —
re-measure with --measure_proxy). The reference itself publishes no numbers
and cannot run here (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time

# Proxy denominator: eager torch-CPU WGAN-GP step on identical math/config,
# measured on this host 2026-08-16 via `python -m bench.proxy_torch --steps 2`
# -> 147.5 s/step (see BASELINE.md). Re-measure with --measure_proxy.
PROXY_STEPS_PER_SEC = 0.00678


def bench_train(cfg, n_warmup=2, n_steps=10):
    import jax
    import numpy as np

    from audiogan_tpu.train.state import create_train_state
    from audiogan_tpu.train.step import build_train_step, num_views

    state = create_train_state(cfg)
    step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    n = num_views(cfg)

    def batch(seed):
        clips = (rng.standard_normal(
            (n, cfg.train.batch_size, cfg.data.store_len)) * 8000
        ).clip(-32768, 32767).astype(np.int16)
        labels = rng.integers(0, max(cfg.data.num_classes, 1),
                              size=(n, cfg.train.batch_size)).astype(np.int32)
        return clips, labels

    clips, labels = batch(0)
    for _ in range(n_warmup):
        state, metrics = step(state, clips, labels)
    float(metrics["d_loss"])  # host fetch: the only reliable sync on axon
    # (block_until_ready returns before execution completes on this
    # experimental platform — verified 2026-08-16, see BASELINE.md)

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, clips, labels)
    float(metrics["d_loss"])  # chains through donated state => syncs all
    dt = time.perf_counter() - t0
    return n_steps / dt


def bench_sample(cfg, n_warmup=2, n_iters=10, num=64):
    import jax

    from audiogan_tpu.train.sample import build_sample_fn
    from audiogan_tpu.train.state import create_train_state

    state = create_train_state(cfg)
    fn = build_sample_fn(cfg)
    key = jax.random.key(0)
    for i in range(n_warmup):
        out = fn(state.params_g, jax.random.fold_in(key, i), num=num)
    float(out[0, 0])  # host fetch sync (see bench_train note)
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(state.params_g, jax.random.fold_in(key, 100 + i), num=num)
    float(out[0, 0])  # device queue is serial, so this syncs all iters
    dt = time.perf_counter() - t0
    audio_sec = n_iters * num * cfg.data.clip_len / cfg.data.sample_rate
    return audio_sec / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="wgan_gp_b64")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--kernels", default=None, choices=["xla", "pallas"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="compute dtype (params stay f32); bf16 is the "
                         "production TPU path — GP norms track f32 to 1e-3 "
                         "(BASELINE.md)")
    ap.add_argument("--measure_proxy", action="store_true",
                    help="also run the torch-CPU proxy (slow)")
    args = ap.parse_args()

    from audiogan_tpu.cli import apply_overrides
    from audiogan_tpu.config import get_preset
    cfg = get_preset(args.preset)
    cfg = apply_overrides(cfg, [f"train.dtype={args.dtype}"])
    if args.kernels:
        cfg = apply_overrides(cfg, [f"train.kernels={args.kernels}"])

    steps_per_sec = bench_train(cfg, n_steps=args.steps)
    audio_sec_per_sec = bench_sample(cfg)

    proxy = PROXY_STEPS_PER_SEC
    if args.measure_proxy:
        from bench.proxy_torch import train_steps
        proxy = 1.0 / min(train_steps(n_steps=2, batch=cfg.train.batch_size))

    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / proxy, 2),
        "audio_sec_per_sec": round(audio_sec_per_sec, 2),
        "preset": cfg.name,
        "batch": cfg.train.batch_size,
        "n_critic": cfg.loss.n_critic,
        "kernels": cfg.train.kernels,
        "dtype": cfg.train.dtype,
        "proxy_steps_per_sec": round(proxy, 5),
    }))


if __name__ == "__main__":
    main()
