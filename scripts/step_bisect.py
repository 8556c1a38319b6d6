"""Bisect the flagship train-step time by kernel tier per network.

Times the full wgan_gp_b64 bf16 step with (G tier, D tier) in
{xla,pallas}^2, all in ONE process so chip-throttle noise is shared.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/step_bisect.py
"""

from __future__ import annotations

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

import audiogan_tpu.models.factory as factory
from audiogan_tpu.cli import apply_overrides
from audiogan_tpu.config import get_preset
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step, num_views

_build_g, _build_d = factory.build_generator, factory.build_discriminator


def bench(g_tier, d_tier, steps=6):
    import dataclasses
    cfg = get_preset("wgan_gp_b64")
    cfg = apply_overrides(cfg, ["train.dtype=bfloat16"])

    def bg(c):
        return _build_g(dataclasses.replace(
            c, train=dataclasses.replace(c.train, kernels=g_tier)))

    def bd(c):
        return _build_d(dataclasses.replace(
            c, train=dataclasses.replace(c.train, kernels=d_tier)))

    factory.build_generator = bg
    factory.build_discriminator = bd
    import audiogan_tpu.train.step as step_mod
    step_mod.build_generator = bg
    step_mod.build_discriminator = bd
    try:
        state = create_train_state(cfg)
        step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
        rng = np.random.default_rng(0)
        n = num_views(cfg)
        clips = (rng.standard_normal((n, cfg.train.batch_size,
                                      cfg.data.store_len)) * 8000
                 ).clip(-32768, 32767).astype(np.int16)
        labels = np.zeros((n, cfg.train.batch_size), np.int32)
        # stage ONCE on device (bench.py input-transfer discovery)
        clips, labels = jax.device_put(clips), jax.device_put(labels)
        for _ in range(2):
            state, m = step(state, clips, labels)
        float(m["d_loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, clips, labels)
        float(m["d_loss"])
        dt = (time.perf_counter() - t0) / steps
        print(f"G={g_tier:6s} D={d_tier:6s}: {1/dt:6.2f} steps/s "
              f"({dt*1e3:7.1f} ms/step)")
    finally:
        factory.build_generator, factory.build_discriminator = (_build_g,
                                                                _build_d)
        step_mod.build_generator = _build_g
        step_mod.build_discriminator = _build_d


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for g in ("xla", "pallas"):
        for d in ("xla", "pallas"):
            bench(g, d)
