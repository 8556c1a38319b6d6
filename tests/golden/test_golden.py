"""Golden-sample fidelity tests (SURVEY §4.6, [B:5] fidelity clause).

Fixed init seed + fixed sampling seed -> generated waveform pinned against a
checked-in .npy per model family. This is the executable stand-in for the
reference-fidelity oracle (the reference mount is empty, SURVEY R1): any
refactor that changes output numerics beyond float tolerance fails here.

Cases live in tests/helpers_golden.py (shared with the on-hardware witness
tests_tpu/run_fidelity_tpu.py): every generator family incl. the music
geometry, plus the resampled-ingest path (22050 -> 16000).

Goldens are generated on the CPU backend (the suite's platform). Regenerate
deliberately with: AUDIOGAN_REGEN_GOLDEN=1 pytest tests/golden -q
"""

import os
from pathlib import Path

import jax
import numpy as np
import pytest

from audiogan_tpu.ops.ingest import ingest_batch
from audiogan_tpu.train.sample import generate
from audiogan_tpu.train.state import create_train_state

from helpers_golden import (GENERATOR_CASES, resample_data_cfg,
                            resample_raw_fixture)

GOLDEN_DIR = Path(__file__).parent / "data"


def _check(name: str, got: np.ndarray, atol=1e-5, rtol=1e-4):
    path = GOLDEN_DIR / f"{name}.npy"
    if os.environ.get("AUDIOGAN_REGEN_GOLDEN") == "1" or not path.exists():
        GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        np.save(path, got)
        pytest.skip(f"golden regenerated at {path}")
    golden = np.load(path)
    np.testing.assert_allclose(got, golden, atol=atol, rtol=rtol)


@pytest.mark.parametrize("name", sorted(GENERATOR_CASES))
def test_golden_sample(name):
    cfg = GENERATOR_CASES[name]()
    state = create_train_state(cfg, seed=0)
    labels = np.array([0, 7], np.int32) if cfg.data.num_classes else None
    waves = generate(cfg, state.params_g, num=2, seed=123, labels=labels)
    _check(name, waves)


def test_golden_resampled_ingest():
    """C2 on a real data path: int16 @22050 -> polyphase resample ->
    crop/normalize/mu-law @16000, pinned end to end (VERDICT r2 #3)."""
    dcfg = resample_data_cfg()
    raw = resample_raw_fixture()
    out_train = np.asarray(ingest_batch(raw, dcfg, jax.random.key(7)))
    out_eval = np.asarray(ingest_batch(raw, dcfg, None))
    assert out_train.shape == out_eval.shape == (2, dcfg.clip_len)
    _check("resample_ingest", np.stack([out_train, out_eval]))
