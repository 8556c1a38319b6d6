#!/bin/bash
# Round-3 session-5 TPU batch: verify the remat-off default + wgrad VMEM
# fix on the chip, refresh the headline, re-baseline the matmul roof.
# Run sequentially, ONE claim at a time, never killed mid-run (axon
# stale-lease gotcha — WORKLOG).
# Usage: bash scripts/r3s5_tpu.sh 2>&1 | tee /tmp/r3s5_tpu.log
set -x
cd /root/repo

# 0. Verify-skill drive flows 1-3 on the real chip (ingest path, CLI
#    train end-to-end, sample determinism) under the new defaults.
rm -rf /tmp/vrun_r3c
timeout 1800 python scripts/verify_session.py ingest train sample

# 1. Remat A/B at the two presets the 2026-08-18 log did not cover
#    (tiny covers the CPU-runnable config; music confirms the flip at the
#    long-clip geometry against the same-day 1.41-steps/s probe).
timeout 1800 python scripts/step_ab.py --preset tiny_sc09 \
  --variant base \
  --variant "remat=train.remat_discriminator=true" \
  --rounds 5 --steps 30

# 1b. Re-run the 4-tier compare under the new no-remat default (the
#     routing bands were measured under remat-on steps; confirm auto
#     still leads) and re-check scan_unroll now that the scan body is
#     heavier-activation / lighter-compute.
timeout 1800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant auto \
  --variant "xla=train.kernels=xla" \
  --variant "pallas=train.kernels=pallas" \
  --variant "mixed=train.kernels=xla;train.kernels_g=pallas" \
  --rounds 6 --steps 10
timeout 1200 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "unroll5=train.scan_unroll=5" \
  --rounds 4 --steps 10

# 2. Headline bench on the new default (expect ~8.5 steps/s flagship).
timeout 1800 python bench.py

# 3. Full six-preset table refresh.
timeout 3600 python bench.py --preset all

# 4. Critic-path decomposition, both tiers — crashed pre-fix on the wgrad
#    VMEM OOM; the budget-model fix must let uniform pallas compile.
timeout 1800 python scripts/d_path_bench.py --rounds 6

# 5. Fidelity witness (remat changes no math; cheap insurance).
timeout 1800 python tests_tpu/run_fidelity_tpu.py

# 6. Matmul-roof re-calibration under the staged methodology.
timeout 1800 python scripts/chip_calibration.py
