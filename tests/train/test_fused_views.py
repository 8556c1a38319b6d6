"""train.fused_d_views: the critic's real+fake evaluations fused into ONE
2B-batch call (glue-hunt lever, round 5 — see config.TrainCfg.fused_d_views).

The critic factorizes over the batch (WGAN-GP forbids batch norm), so with
phase shuffle OFF the fused step is the SAME math as the unfused one — the
only difference is op structure (one 2B conv stack / one parameter-backward
instead of two accumulated). With shuffle ON the rng stream differs (2B
shifts from one key), so those cases pin finiteness + determinism instead.
"""

import dataclasses as dc

import jax
import numpy as np

from audiogan_tpu.config import DataCfg, ModelCfg
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step

from helpers_train import raw_batch, tiny_config


def _run(cfg, n_steps=2, seed=7):
    state = create_train_state(cfg)
    step = jax.jit(build_train_step(cfg))
    hist = []
    for s in range(n_steps):
        clips, labels = raw_batch(cfg, seed=seed + s)
        state, m = step(state, clips, labels)
        hist.append(jax.device_get(m))
    return state, hist


def _fused_pair(**kw):
    base = tiny_config(**kw)
    unfused = dc.replace(
        base, train=dc.replace(base.train, fused_d_views=False))
    fused = dc.replace(
        base, train=dc.replace(base.train, fused_d_views=True))
    return unfused, fused


def test_fused_matches_unfused_shuffle_off():
    """phase_shuffle=0: identical math, so every metric of every step must
    match to fp-reassociation tolerance (the 2B conv tiles differently)."""
    shuffle_off = ModelCfg(generator="wavegan", model_dim=4, kernel_size=9,
                           strides=(4, 4, 4), max_channels=16,
                           phase_shuffle=0)
    unfused, fused = _fused_pair(model=shuffle_off)
    _, h0 = _run(unfused)
    _, h1 = _run(fused)
    for m0, m1 in zip(h0, h1):
        for k in m0:
            np.testing.assert_allclose(m1[k], m0[k], rtol=2e-5, atol=1e-6,
                                       err_msg=k)


def test_fused_conditional_matches_unfused_shuffle_off():
    """Projection-conditional critic: the fused call concatenates labels
    too; equality must still hold with shuffle off."""
    shuffle_off = ModelCfg(generator="wavegan", model_dim=4, kernel_size=9,
                           strides=(4, 4, 4), max_channels=16,
                           phase_shuffle=0)
    unfused, fused = _fused_pair(
        model=shuffle_off,
        data=DataCfg(clip_len=1024, store_len=1280, num_classes=10))
    _, h0 = _run(unfused)
    _, h1 = _run(fused)
    for m0, m1 in zip(h0, h1):
        for k in m0:
            np.testing.assert_allclose(m1[k], m0[k], rtol=2e-5, atol=1e-6,
                                       err_msg=k)


def test_fused_shuffle_on_trains_and_is_deterministic():
    """phase_shuffle>0 changes the shift stream (2B draws from one key), so
    no unfused equality — pin that the fused step trains (finite metrics,
    moving w_dist) and is (seed, step)-deterministic."""
    _, fused = _fused_pair()
    assert fused.model.phase_shuffle == 1
    state, h1 = _run(fused, n_steps=3)
    assert int(state.step) == 3
    for m in h1:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} not finite: {v}"
    assert h1[0]["w_dist"] != h1[-1]["w_dist"]
    _, h2 = _run(fused, n_steps=3)
    for m1, m2 in zip(h1, h2):
        for k in m1:
            np.testing.assert_array_equal(m1[k], m2[k], err_msg=k)


def test_fused_composes_with_fused_shuffle_sites():
    """fused_d_views (batch fusion) and fused_shuffle_sites (sconv time-
    shift fusion) are independent; the composed step must train."""
    base = tiny_config()
    cfg = dc.replace(
        base,
        model=dc.replace(base.model, fused_shuffle_sites=-1),
        train=dc.replace(base.train, fused_d_views=True)).validate()
    _, hist = _run(cfg, n_steps=2)
    for m in hist:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} not finite: {v}"
