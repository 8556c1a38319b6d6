import jax
import numpy as np
import pytest

from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step, num_views

from helpers_train import tiny_config


def _raw_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    n = num_views(cfg)
    clips = (rng.standard_normal((n, cfg.train.batch_size, cfg.data.store_len))
             * 8000).clip(-32768, 32767).astype(np.int16)
    labels = rng.integers(0, max(cfg.data.num_classes, 1),
                          size=(n, cfg.train.batch_size)).astype(np.int32)
    return clips, labels


def _run_steps(cfg, n_steps, seed=0):
    state = create_train_state(cfg)
    step = jax.jit(build_train_step(cfg))
    history = []
    for s in range(n_steps):
        clips, labels = _raw_batch(cfg, seed=1000 + s)
        state, metrics = step(state, clips, labels)
        history.append(jax.device_get(metrics))
    return state, history


def test_losses_finite_and_training_moves(tiny_cfg):
    state, hist = _run_steps(tiny_cfg, 3)
    assert int(state.step) == 3
    for m in hist:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} not finite: {v}"
    # critic updates actually change the Wasserstein estimate
    assert hist[0]["w_dist"] != hist[-1]["w_dist"]


def test_deterministic_given_seed(tiny_cfg):
    _, h1 = _run_steps(tiny_cfg, 2)
    _, h2 = _run_steps(tiny_cfg, 2)
    for m1, m2 in zip(h1, h2):
        for k in m1:
            np.testing.assert_array_equal(m1[k], m2[k], err_msg=k)


def test_conditional_step():
    cfg = tiny_config(data=__import__("dataclasses").replace(
        tiny_config().data, num_classes=10))
    state, hist = _run_steps(cfg, 2)
    assert all(np.isfinite(v) for m in hist for v in m.values())


def test_gru_generator_step():
    from audiogan_tpu.config import ModelCfg
    cfg = tiny_config(model=ModelCfg(generator="gru", model_dim=4,
                                     kernel_size=9, gru_frame_size=64,
                                     gru_hidden=16, max_channels=16,
                                     phase_shuffle=1))
    state, hist = _run_steps(cfg, 2)
    assert all(np.isfinite(v) for m in hist for v in m.values())


def test_dual_stft_step():
    from audiogan_tpu.config import LossCfg, ModelCfg
    cfg = tiny_config(
        model=ModelCfg(generator="wavegan", model_dim=4, kernel_size=9,
                       strides=(4, 4, 4), max_channels=16, phase_shuffle=1,
                       use_stft_critic=True,
                       stft_resolutions=((128, 32, 128),)),
        loss=LossCfg(n_critic=2, stft_loss_weight=1.0))
    state, hist = _run_steps(cfg, 2)
    assert "stft_loss" in hist[0]
    assert all(np.isfinite(v) for m in hist for v in m.values())


def test_gp_pulls_grad_norm_toward_one(tiny_cfg):
    # after enough critic steps the GP term drives ||grad D|| toward 1
    import dataclasses
    cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train, lr_d=2e-3))
    state, hist = _run_steps(cfg, 12)
    assert abs(hist[-1]["gp_grad_norm"] - 1.0) < abs(hist[0]["gp_grad_norm"] - 1.0)


def test_gp_chunked_step_matches(tiny_cfg):
    # phase shuffle draws per-example shifts positionally, so chunked GP is
    # only bit-comparable with shuffling off (both variants are valid
    # semantics; equality is the memory-path correctness check)
    import dataclasses
    base = dataclasses.replace(
        tiny_cfg, model=dataclasses.replace(tiny_cfg.model, phase_shuffle=0))
    cfg_c = dataclasses.replace(
        base, loss=dataclasses.replace(base.loss, gp_batch_chunks=2))
    _, h1 = _run_steps(base, 2)
    _, h2 = _run_steps(cfg_c, 2)
    for k in h1[-1]:
        np.testing.assert_allclose(h1[-1][k], h2[-1][k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_scan_unroll_step_matches(tiny_cfg):
    """train.scan_unroll only changes XLA scheduling, never semantics."""
    import dataclasses
    cfg_u = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train, scan_unroll=2))
    _, h1 = _run_steps(tiny_cfg, 2)
    _, h2 = _run_steps(cfg_u, 2)
    for k in h1[-1]:
        np.testing.assert_allclose(h1[-1][k], h2[-1][k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
