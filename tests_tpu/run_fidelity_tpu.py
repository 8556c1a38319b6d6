"""On-hardware fidelity witness ([B:5] fidelity clause; VERDICT r1 item 6).

Runs the golden-sample generation cases of tests/golden/test_golden.py on
the REAL TPU chip (the ambient default platform — do NOT set
JAX_PLATFORMS=cpu) and compares the waveforms against the CPU-generated
goldens checked in under tests/golden/data/. This is the witness that
identical weights + seed produce waveform-equivalent samples ACROSS
BACKENDS, not just across refactors on one backend.

Tolerance: TPU matmul precision is forced to "highest" (same as the test
suite) so the remaining divergence is bf16-free float32 accumulation-order
noise; the generators end in tanh so outputs are O(1) and an absolute
tolerance is meaningful. Stated bound: atol=2e-4, rtol=2e-3 (observed
max|diff| is recorded per case in the output and in BASELINE.md).

Run manually / via Makefile: python tests_tpu/run_fidelity_tpu.py
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

from audiogan_tpu.config import ModelCfg  # noqa: E402
from audiogan_tpu.train.sample import generate  # noqa: E402
from audiogan_tpu.train.state import create_train_state  # noqa: E402
from helpers_train import tiny_config  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parents[1] / "tests" / "golden" / "data"

ATOL, RTOL = 2e-4, 2e-3


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


def main() -> int:
    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")
    if backend == "cpu":
        print("WARNING: running on CPU — this witnesses nothing beyond "
              "tests/golden; run with the ambient TPU platform.")
    ok = True
    for name in sorted(CASES):
        cfg = CASES[name]()
        state = create_train_state(cfg, seed=0)
        labels = (np.array([0, 7], np.int32)
                  if cfg.data.num_classes else None)
        waves = np.asarray(
            generate(cfg, state.params_g, num=2, seed=123, labels=labels))
        golden = np.load(GOLDEN_DIR / f"{name}.npy")
        err = float(np.max(np.abs(waves - golden)))
        case_ok = np.allclose(waves, golden, atol=ATOL, rtol=RTOL)
        ok &= bool(case_ok)
        print(f"{'OK ' if case_ok else 'FAIL'} {name}: "
              f"max|tpu-cpu_golden|={err:.2e} (atol={ATOL}, rtol={RTOL})")
    print("fidelity witness:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
