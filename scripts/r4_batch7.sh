#!/bin/bash
# Round-4 batch 7 (final-stack verification records, after batch 6):
#   1. on-HW fidelity witness vs CPU goldens ([B:5] clause)
#   2. 4-tier step compare at the flagship on the FINAL r4 stack
#      (sconv fused site + wgrad conv form + bf16 defaults)
#   3. convt-band ablation re-check on the final stack (the +9.1% r3s6
#      number predates sconv/wgrad-form; confirm the band still carries)
#   4. verify-session drive flows (ingest, CLI train/sample determinism,
#      bench line, sampler A/B)
# Usage: setsid bash scripts/r4_batch7.sh > /tmp/r4_batch7.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

echo "===== (1) fidelity witness ====="
timeout 3600 python tests_tpu/run_fidelity_tpu.py || echo "FIDELITY FAIL"

echo "===== (2) flagship 4-tier compare, final stack ====="
timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --rounds 4 --steps 10 \
  --variant auto=train.kernels=auto \
  --variant xla=train.kernels=xla \
  --variant mixed="train.kernels_g=pallas;train.kernels_d=xla" \
  --variant pallas=train.kernels=pallas || echo "TIER_AB FAIL"

echo "===== (3) convt-band ablation, final stack ====="
timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --rounds 4 --steps 10 \
  --variant base=train.kernels=auto \
  --variant noconvt="gvar:audiogan_tpu.kernels.conv._AUTO_CONVT_MIN=1073741824" \
  || echo "BAND_AB FAIL"

echo "===== (4) verify-session flows ====="
timeout 3600 python scripts/verify_session.py || echo "VERIFY FAIL"

echo "===== r4_batch7 done ====="
