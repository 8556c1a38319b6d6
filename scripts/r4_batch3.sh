#!/bin/bash
# Round-4 TPU batch 3: final fused-shuffle default decision on the
# PASSTHROUGH sconv lowerings.
#
# Batch 2b found the XLA-tier sconv lowerings hardcoded impl="xla" for
# their inner convs, costing fused sites the winning Pallas convT band on
# the AD-transpose path (fused-all: 1.073 under uniform xla, 1.000 under
# auto). kernels/sconv.py now threads the ambient tier through; the
# batch-2b risky leg already showed fxla 1.000 -> 1.029 post-fix.
# The Pallas sconv tier is SETTLED: loses at step level (0.918 flagship /
# 0.938 dual, batch 2b risky) — no fxp legs here.
#
#   (0) sconv_layer_check: adjudicate the sconv_hw_check f32 FAIL —
#       kernel bug vs XLA-default-precision artifact (third 'highest' leg)
#   (a) flagship  base / fx1 / fxla  (one interleaved decision run)
#   (b) dual      base / fx1 / fxla  (0.998 pre-fix; the fix may flip it)
#   (c) cond_gru  base / fxla        (1.028 pre-fix, re-pin post-fix)
#   (d) tiny      base / fxla        (1.016 pre-fix, re-pin post-fix)
# music (1.011, all-xla router — passthrough is a no-op) and resample
# (0.981, keeps sites=0) are decided on batch-2/2b data.
# Usage: bash scripts/r4_batch3.sh 2>&1 | tee /tmp/r4_batch3.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

F=model.fused_shuffle_sites
NOSP="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONV_MIN=1073741824"
NOST="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONVT_MIN=1073741824"

echo "===== (0) sconv layer-level adjudicator ====="
timeout 2400 python scripts/sconv_layer_check.py || echo "LAYER_CHECK FAIL"

echo "===== (a) flagship: base / fx1 / fxla ====="
timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "fx1=$F=1;$NOSP;$NOST" \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 6 --steps 10 || echo "AB_FLAGSHIP FAIL"

echo "===== (b) dual_stft: base / fx1 / fxla ====="
timeout 4800 python scripts/step_ab.py --preset dual_stft \
  --variant base \
  --variant "fx1=$F=1;$NOSP;$NOST" \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 4 --steps 10 || echo "AB_DUAL FAIL"

echo "===== (c) cond_gru: base / fxla ====="
timeout 3600 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant base \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 4 --steps 10 || echo "AB_GRU FAIL"

echo "===== (d) tiny: base / fxla ====="
timeout 2400 python scripts/step_ab.py --preset tiny_sc09 \
  --variant base \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 4 --steps 30 || echo "AB_TINY FAIL"

echo "===== r4_batch3 done ====="
