#!/bin/bash
# Round-3 session-9 TPU batch: the wgrad contraction-form A/B.
# Profile r3s8 put the conv1d dW einsums at 8.2 ms + convT dW-in-GP at
# 6.4 ms + ~4 ms of reshape (the einsum stack's s-sample row packing)
# out of a 94 ms flagship step. The conv form (_conv1d_wgrad_conv /
# _convt1d_wgrad_conv) is ONE conv_general_dilated with batch=channels
# dimension numbers — no lane relayout. This batch:
#   (a) value-witnesses the new dimension-number pattern compiled on HW
#       (lhs_dilation-miscompile precedent), plus a per-geometry micro A/B
#   (b) step-A/Bs gvar _WGRAD_FORM=conv at every preset.
# Usage: bash scripts/r3s9_tpu.sh 2>&1 | tee /tmp/r3s9_tpu.log
set -x
cd /root/repo

W=gvar:audiogan_tpu.kernels.conv._WGRAD_FORM

timeout 2400 python scripts/wgrad_form_check.py || exit 1

timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "wconv=$W=conv" \
  --rounds 6 --steps 10

timeout 3600 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant base --variant "wconv=$W=conv" --rounds 4 --steps 10

timeout 3600 python scripts/step_ab.py --preset dual_stft \
  --variant base --variant "wconv=$W=conv" --rounds 4 --steps 10

timeout 3600 python scripts/step_ab.py --preset tiny_sc09 \
  --variant base --variant "wconv=$W=conv" --rounds 4 --steps 30

timeout 3600 python scripts/step_ab.py --preset music_44k_dp16 \
  --variant "base=mesh.dp=1" --variant "wconv=mesh.dp=1;$W=conv" \
  --rounds 3 --steps 6
