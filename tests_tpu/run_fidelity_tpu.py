"""On-hardware fidelity witness ([B:5] fidelity clause; VERDICT r1 item 6).

Runs the golden-sample cases of tests/golden/test_golden.py on the REAL TPU
chip (the ambient default platform — do NOT set JAX_PLATFORMS=cpu) and
compares against the CPU-generated goldens checked in under
tests/golden/data/. This is the witness that identical weights + seed
produce waveform-equivalent samples ACROSS BACKENDS, not just across
refactors on one backend.

Cases (shared with the CPU suite via tests/helpers_golden.py): every
generator family — wavegan, gru, conditional, and the music geometry
(strides 7/7/5/5/3; the family most exposed to the lhs_dilation-class
platform miscompiles this witness already caught once) — plus the
resampled-ingest path (22050 -> 16000 true-polyphase C2 on-chip).

Tolerance: TPU matmul precision is forced to "highest" (same as the test
suite) so the remaining divergence is bf16-free float32 accumulation-order
noise; the generators end in tanh so outputs are O(1) and an absolute
tolerance is meaningful. Stated bound: atol=2e-4, rtol=2e-3 (observed
max|diff| is recorded per case in the output and in BASELINE.md).

Run manually / via Makefile: python tests_tpu/run_fidelity_tpu.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

from audiogan_tpu.ops.ingest import ingest_batch  # noqa: E402
from audiogan_tpu.train.sample import generate  # noqa: E402
from audiogan_tpu.train.state import create_train_state  # noqa: E402
from helpers_golden import (GENERATOR_CASES,  # noqa: E402
                            resample_data_cfg, resample_raw_fixture)

GOLDEN_DIR = Path(__file__).resolve().parents[1] / "tests" / "golden" / "data"

ATOL, RTOL = 2e-4, 2e-3


def main() -> int:
    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")
    if backend == "cpu":
        print("WARNING: running on CPU — this witnesses nothing beyond "
              "tests/golden; run with the ambient TPU platform.")
    ok = True

    def check(name, got):
        nonlocal ok
        path = GOLDEN_DIR / f"{name}.npy"
        if not path.exists():
            print(f"SKIP {name}: no CPU golden at {path} (regenerate with "
                  f"AUDIOGAN_REGEN_GOLDEN=1 pytest tests/golden -q)")
            return
        golden = np.load(path)
        err = float(np.max(np.abs(got - golden)))
        case_ok = np.allclose(got, golden, atol=ATOL, rtol=RTOL)
        ok &= bool(case_ok)
        print(f"{'OK ' if case_ok else 'FAIL'} {name}: "
              f"max|tpu-cpu_golden|={err:.2e} (atol={ATOL}, rtol={RTOL})")

    for name in sorted(GENERATOR_CASES):
        cfg = GENERATOR_CASES[name]()
        state = create_train_state(cfg, seed=0)
        labels = (np.array([0, 7], np.int32)
                  if cfg.data.num_classes else None)
        waves = np.asarray(
            generate(cfg, state.params_g, num=2, seed=123, labels=labels))
        check(name, waves)

    dcfg = resample_data_cfg()
    raw = resample_raw_fixture()
    out_train = np.asarray(ingest_batch(raw, dcfg, jax.random.key(7)))
    out_eval = np.asarray(ingest_batch(raw, dcfg, None))
    check("resample_ingest", np.stack([out_train, out_eval]))

    print("fidelity witness:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
