import jax
import numpy as np

from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step
from audiogan_tpu.utils import checkpoint as ckpt_lib

from helpers_train import raw_batch as _raw_batch


def test_save_restore_bit_exact(tiny_cfg, tmp_path):
    state = create_train_state(tiny_cfg)
    step = jax.jit(build_train_step(tiny_cfg))
    clips, labels = _raw_batch(tiny_cfg)
    state, _ = step(state, clips, labels)

    mngr = ckpt_lib.make_manager(tmp_path, keep=2)
    ckpt_lib.save(mngr, jax.device_get(state), wait=True)

    abstract = create_train_state(tiny_cfg)
    restored = ckpt_lib.restore(mngr, abstract)
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_replays_identical_stream(tiny_cfg, tmp_path):
    """4 straight steps == 2 steps + ckpt + restore + 2 steps (SURVEY §5)."""
    step = jax.jit(build_train_step(tiny_cfg))

    def advance(state, s0, n):
        hist = []
        for s in range(s0, s0 + n):
            clips, labels = _raw_batch(tiny_cfg, seed=1000 + s)
            state, m = step(state, clips, labels)
            hist.append(jax.device_get(m))
        return state, hist

    sA, hA = advance(create_train_state(tiny_cfg), 0, 4)

    sB, _ = advance(create_train_state(tiny_cfg), 0, 2)
    mngr = ckpt_lib.make_manager(tmp_path, keep=2)
    ckpt_lib.save(mngr, jax.device_get(sB), wait=True)
    restored = ckpt_lib.restore(mngr, create_train_state(tiny_cfg))
    sB2, hB = advance(restored, 2, 2)

    for k in hA[-1]:
        np.testing.assert_array_equal(hA[-1][k], hB[-1][k], err_msg=k)
    for a, b in zip(jax.tree.leaves(jax.device_get(sA)),
                    jax.tree.leaves(jax.device_get(sB2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_by_metric_policy(tiny_cfg, tmp_path):
    mngr = ckpt_lib.make_manager(tmp_path, keep=1, best_metric="w_dist",
                                 best_mode="max")
    state = create_train_state(tiny_cfg)
    step = jax.jit(build_train_step(tiny_cfg))
    # three saves with increasing then decreasing metric: keep=1 best
    for s, wd in [(0, 1.0), (1, 5.0), (2, 2.0)]:
        clips, labels = _raw_batch(tiny_cfg, seed=s)
        state, _ = step(state, clips, labels)
        ckpt_lib.save(mngr, jax.device_get(state), wait=True,
                      metrics={"w_dist": wd})
    assert mngr.best_step() == 2  # step counter after 2nd save (w_dist 5.0)
