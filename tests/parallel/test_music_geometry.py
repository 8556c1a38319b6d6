"""[B:11] music config geometry (non-uniform strides 7/7/5/5/3 at 44.1 kHz)
data-parallel over the 8-device farm — the scaled-down CI stand-in for
v5e-16 (full clip_len swapped for one stride-compatible chunk so the test
runs in seconds; geometry and mesh mechanics are identical)."""

import dataclasses

import jax
import numpy as np

from audiogan_tpu.config import (Config, DataCfg, LossCfg, MeshCfg, ModelCfg,
                                 TrainCfg, get_preset)
from audiogan_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                        make_mesh, state_shardings)
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step, num_views


def test_music_preset_validates():
    cfg = get_preset("music_44k_dp16")
    assert cfg.data.clip_len == 176400
    assert cfg.model.total_stride == 7 * 7 * 5 * 5 * 3
    assert cfg.data.clip_len % cfg.model.total_stride == 0
    assert cfg.mesh.dp == 16


def test_music_geometry_dp8_trains():
    dp = 8
    cfg = Config(
        name="music_tiny",
        data=DataCfg(sample_rate=44100, source_rate=44100,
                     clip_len=3675 * 4, store_len=3675 * 5),
        model=ModelCfg(generator="wavegan", model_dim=4,
                       strides=(7, 7, 5, 5, 3), kernel_size=25,
                       max_channels=16, phase_shuffle=2),
        loss=LossCfg(n_critic=2),
        train=TrainCfg(batch_size=2 * dp),
        mesh=MeshCfg(dp=dp, cp=1),
    ).validate()

    mesh = make_mesh(cfg)
    state = create_train_state(cfg)
    state = jax.device_put(state, state_shardings(mesh, state))
    step = jax.jit(build_train_step(cfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    n = num_views(cfg)
    clips = (rng.standard_normal((n, cfg.train.batch_size,
                                  cfg.data.store_len)) * 8000
             ).clip(-32768, 32767).astype(np.int16)
    labels = np.zeros((n, cfg.train.batch_size), np.int32)
    clips = jax.device_put(clips, batch_sharding(mesh))
    labels = jax.device_put(labels, label_sharding(mesh))
    state, metrics = step(state, clips, labels)
    m = jax.device_get(metrics)
    assert all(np.isfinite(v) for v in m.values())
