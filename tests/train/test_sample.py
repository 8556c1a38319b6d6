import numpy as np

from audiogan_tpu.train.sample import generate
from audiogan_tpu.train.state import create_train_state

from helpers_train import tiny_config


def test_seed_determinism(tiny_cfg):
    state = create_train_state(tiny_cfg)
    a = generate(tiny_cfg, state.params_g, num=3, seed=7)
    b = generate(tiny_cfg, state.params_g, num=3, seed=7)
    c = generate(tiny_cfg, state.params_g, num=3, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (3, tiny_cfg.data.clip_len)
    assert np.abs(a).max() <= 1.0 + 1e-5


def test_conditional_labels(rng):
    import dataclasses
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg,
                              data=dataclasses.replace(cfg.data,
                                                       num_classes=10))
    state = create_train_state(cfg)
    labels = np.array([0, 5, 9], np.int32)
    a = generate(cfg, state.params_g, num=3, seed=1, labels=labels)
    b = generate(cfg, state.params_g, num=3, seed=1,
                 labels=np.array([1, 5, 2], np.int32))
    assert a.shape == (3, cfg.data.clip_len)
    assert not np.allclose(a[0], b[0])          # label changed
    np.testing.assert_array_equal(a[1], b[1])   # same label, same z
