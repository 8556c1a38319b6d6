#!/bin/bash
# Round-4 TPU batch 2: the Pallas sconv kernels on HW.
#   (a) exactness witness (fused==unfused at xla; pallas vs xla within the
#       measured cross-tier noise floor) — scripts/sconv_hw_check.py
#   (b) interleaved step A/B of fused_shuffle_sites at the flagship and
#       dual_stft presets under kernels=auto (sconvt pallas band on)
#   (c) the same at sites=1/2 granularity to find the winning site count
# Usage: bash scripts/r4_batch2.sh 2>&1 | tee /tmp/r4_batch2.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

F=model.fused_shuffle_sites

timeout 2400 python scripts/sconv_hw_check.py || echo "SCONV_HW FAIL"

timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "fused1=$F=1" \
  --variant "fused2=$F=2" \
  --variant "fusedall=$F=-1" \
  --rounds 6 --steps 10

timeout 3600 python scripts/step_ab.py --preset dual_stft \
  --variant base \
  --variant "fused2=$F=2" \
  --variant "fusedall=$F=-1" \
  --rounds 4 --steps 10

# (d) XLA-tier isolation: the sconv XLA lowering replaces the select form's
#     2*rad+2 elementwise traversals with mask_reflect_pad's 2 — measure
#     that alone, with the Pallas bands out of the picture.
timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant "xbase=train.kernels=xla" \
  --variant "xfused=train.kernels=xla;$F=-1" \
  --rounds 4 --steps 10

# (e) music dp=1: select_n was 7.4% of the 682 ms step in the r4 profile
timeout 3600 python scripts/step_ab.py --preset music_44k_dp16 \
  --variant "base=mesh.dp=1" \
  --variant "fusedall=mesh.dp=1;$F=-1" \
  --rounds 3 --steps 6

echo "===== r4_batch2 done ====="
