"""Cross-topology checkpoint restore (SURVEY C17: "sharding-aware so a
ckpt written on v5e-16 restores on 1 chip and vice versa").

Checkpoints are written as gathered host arrays (utils/checkpoint.py via
device_get / _AsyncCkpt._fetch), so the mesh that wrote a ckpt must not
constrain the mesh that restores it. Pinned both directions, with ZeRO-1
(mesh.fsdp) on the dp=8 side so the hard case — optimizer-state leaves
physically SHARDED over 'data' at save time — is the one exercised.
"""

import jax
import numpy as np

from helpers_train import raw_batch, tiny_config

from audiogan_tpu.config import MeshCfg, TrainCfg
from audiogan_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                        make_mesh, state_shardings)
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step
from audiogan_tpu.utils import checkpoint as ckpt_lib

DP = 8


def _cfg(dp):
    return tiny_config(
        mesh=MeshCfg(dp=dp, cp=1, fsdp=(dp > 1)),
        train=TrainCfg(batch_size=8, total_steps=4, log_every=2,
                       ckpt_every=100, sample_every=0, seed=0),
    )


def _advance(cfg, state, mesh, s0, n):
    step = jax.jit(build_train_step(cfg))
    m = None
    for s in range(s0, s0 + n):
        clips, labels = raw_batch(cfg, seed=500 + s)
        if mesh is not None:
            clips = jax.device_put(clips, batch_sharding(mesh))
            labels = jax.device_put(labels, label_sharding(mesh))
        state, m = step(state, clips, labels)
    return state, jax.device_get(m)


def test_dp8_fsdp_ckpt_restores_on_single_device(tmp_path):
    cfg8 = _cfg(DP)
    mesh8 = make_mesh(cfg8)
    state = create_train_state(cfg8)
    state = jax.device_put(state, state_shardings(mesh8, state, fsdp=True))
    state, _ = _advance(cfg8, state, mesh8, 0, 2)

    mngr = ckpt_lib.make_manager(tmp_path, keep=2)
    ckpt_lib.save(mngr, jax.device_get(state), wait=True)

    # restore into a single-device config: every leaf bit-equal to the
    # gathered dp=8 state, then training continues with finite metrics
    cfg1 = _cfg(1)
    restored = ckpt_lib.restore(mngr, create_train_state(cfg1))
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cont1, m1 = _advance(cfg1, restored, None, 2, 2)
    assert all(np.isfinite(v) for v in m1.values()), m1

    # the single-device continuation matches the dp=8 continuation of the
    # SAME global batches to reduction-order tolerance (test_dp pins the
    # dp-equality itself; this pins it THROUGH the restore boundary)
    _, m8 = _advance(cfg8, state, mesh8, 2, 2)
    for k in m8:
        np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)


def test_single_device_ckpt_restores_on_dp8_fsdp(tmp_path):
    cfg1 = _cfg(1)
    state, _ = _advance(cfg1, create_train_state(cfg1), None, 0, 2)
    mngr = ckpt_lib.make_manager(tmp_path, keep=2)
    ckpt_lib.save(mngr, jax.device_get(state), wait=True)

    cfg8 = _cfg(DP)
    mesh8 = make_mesh(cfg8)
    restored = ckpt_lib.restore(mngr, create_train_state(cfg8))
    restored = jax.device_put(
        restored, state_shardings(mesh8, restored, fsdp=True))
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(jax.device_get(restored))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    _, m8 = _advance(cfg8, restored, mesh8, 2, 2)
    assert all(np.isfinite(v) for v in m8.values()), m8
