#!/bin/bash
# Round-4 TPU batch 4: close the fused-shuffle default decision.
#
# Batch 3's 3-variant flagship A/B died RESOURCE_EXHAUSTED while warming
# the third resident graph (base+fx1 compiled, fxla's warmup OOM'd the
# chip) — flagship graphs at batch 64 are too big for three at once, so
# the decision runs PAIRWISE here:
#   (a) flagship base / fx1   (the shipping candidate: batch-2b 1.031)
#   (b) flagship fx1 / fxla   (is fusing every site better than one?)
#   (c) sconv HW witness re-run with the precision-dominance leg
#       (batch-2b's FAIL was adjudicated by sconv_layer_check as the
#       XLA-default-precision artifact; the witness now measures the
#       highest-vs-default spread of its own graph and judges against it)
# Usage: bash scripts/r4_batch4.sh 2>&1 | tee /tmp/r4_batch4.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

F=model.fused_shuffle_sites
NOSP="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONV_MIN=1073741824"
NOST="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONVT_MIN=1073741824"

echo "===== (a) flagship: base / fx1 ====="
timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "fx1=$F=1;$NOSP;$NOST" \
  --rounds 6 --steps 10 || echo "AB_A FAIL"

echo "===== (b) flagship: fx1 / fxla ====="
timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant "fx1=$F=1;$NOSP;$NOST" \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 6 --steps 10 || echo "AB_B FAIL"

echo "===== (c) sconv HW witness (precision-dominance form) ====="
timeout 2400 python scripts/sconv_hw_check.py || echo "SCONV_HW FAIL"

echo "===== r4_batch4 done ====="
