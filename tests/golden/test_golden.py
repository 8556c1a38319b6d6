"""Golden-sample fidelity tests (SURVEY §4.6, [B:5] fidelity clause).

Fixed init seed + fixed sampling seed -> generated waveform pinned against a
checked-in .npy per model family. This is the executable stand-in for the
reference-fidelity oracle (the reference mount is empty, SURVEY R1): any
refactor that changes output numerics beyond float tolerance fails here.

Goldens are generated on the CPU backend (the suite's platform). Regenerate
deliberately with: AUDIOGAN_REGEN_GOLDEN=1 pytest tests/golden -q
"""

import dataclasses
import os
from pathlib import Path

import numpy as np
import pytest

from audiogan_tpu.config import ModelCfg
from audiogan_tpu.train.sample import generate
from audiogan_tpu.train.state import create_train_state

from helpers_train import tiny_config

GOLDEN_DIR = Path(__file__).parent / "data"


def _case_wavegan():
    return tiny_config()


def _case_gru():
    return tiny_config(model=ModelCfg(
        generator="gru", model_dim=4, kernel_size=9, gru_frame_size=64,
        gru_hidden=16, max_channels=16, phase_shuffle=1))


def _case_conditional():
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, num_classes=10))


CASES = {"wavegan": _case_wavegan, "gru": _case_gru,
         "conditional": _case_conditional}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_sample(name):
    cfg = CASES[name]()
    state = create_train_state(cfg, seed=0)
    labels = np.array([0, 7], np.int32) if cfg.data.num_classes else None
    waves = generate(cfg, state.params_g, num=2, seed=123, labels=labels)

    path = GOLDEN_DIR / f"{name}.npy"
    if os.environ.get("AUDIOGAN_REGEN_GOLDEN") == "1" or not path.exists():
        GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        np.save(path, waves)
        pytest.skip(f"golden regenerated at {path}")
    golden = np.load(path)
    np.testing.assert_allclose(waves, golden, atol=1e-5, rtol=1e-4)
