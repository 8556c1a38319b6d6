#!/bin/bash
# Round-4 TPU batch 5 (post-soak): final-stack records.
#   (a) cond_gru fx1 vs fxla pairwise (the one fused-site default still
#       resting on an unpaired comparison; flip if fx1 wins like the
#       flagship's identical critic did)
#   (b) bench --preset all: the six-line table on the shipped defaults
#   (c) flagship device profile on the final stack (post-sconv) — where
#       does the step spend time now that the shuffle rides the conv?
#   (d) fidelity witness on the final stack
# Usage: bash scripts/r4_batch5.sh 2>&1 | tee /tmp/r4_batch5.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

F=model.fused_shuffle_sites
NOSP="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONV_MIN=1073741824"
NOST="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONVT_MIN=1073741824"

echo "===== (a) cond_gru: fx1 / fxla ====="
timeout 3600 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant "fx1=$F=1;$NOSP;$NOST" \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 5 --steps 10 || echo "AB_GRU FAIL"

echo "===== (b) bench --preset all ====="
timeout 7200 python bench.py --preset all || echo "BENCH_ALL FAIL"

echo "===== (c) flagship device profile (final stack) ====="
timeout 2400 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3 \
  || echo "PROFILE FAIL"

echo "===== (d) fidelity witness ====="
timeout 3600 python tests_tpu/run_fidelity_tpu.py || echo "FIDELITY FAIL"

echo "===== r4_batch5 done ====="
