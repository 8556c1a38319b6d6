"""bfloat16 compute path (params stay f32) — the production TPU config."""

import dataclasses

import jax
import numpy as np

from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step

from helpers_train import raw_batch, tiny_config


def test_bf16_step_trains_and_tracks_f32():
    results = {}
    for dtype in ["float32", "bfloat16"]:
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, dtype=dtype))
        state = create_train_state(cfg)
        step = jax.jit(build_train_step(cfg))
        for s in range(3):
            clips, labels = raw_batch(cfg, seed=100 + s)
            state, metrics = step(state, clips, labels)
        results[dtype] = jax.device_get(metrics)
        # params remain f32 regardless of compute dtype
        assert all(x.dtype == np.float32
                   for x in jax.tree.leaves(state.params_g))
    for k in results["float32"]:
        a, b = results["bfloat16"][k], results["float32"][k]
        assert np.isfinite(a), k
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.05, err_msg=k)
