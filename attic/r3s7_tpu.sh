#!/bin/bash
# Round-3 session-7 TPU batch: the Pallas phase-shuffle kernel pair.
# r3s6b found the shuffle's gather form cost 24% of device time and the
# select form still pays (2*rad+1)x HBM read amplification (shuffle-off
# diagnostic: +15% more headroom). kernels/shuffle.py is the
# one-read-one-write kernel; this batch (a) proves it bit-exact compiled
# on HW, (b) step-A/Bs it against the select default at every preset.
# Usage: bash scripts/r3s7_tpu.sh 2>&1 | tee /tmp/r3s7_tpu.log
set -x
cd /root/repo

P=gvar:audiogan_tpu.ops.phase_shuffle._IMPL

timeout 1800 python scripts/shuffle_hw_check.py || exit 1

timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "shufpal=$P=pallas" \
  --variant "shuffle0=model.phase_shuffle=0" \
  --rounds 6 --steps 10

timeout 3600 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant base --variant "shufpal=$P=pallas" --rounds 4 --steps 10

timeout 3600 python scripts/step_ab.py --preset dual_stft \
  --variant base --variant "shufpal=$P=pallas" --rounds 4 --steps 10

timeout 3600 python scripts/step_ab.py --preset tiny_sc09 \
  --variant base --variant "shufpal=$P=pallas" --rounds 4 --steps 30

timeout 3600 python scripts/step_ab.py --preset music_44k_dp16 \
  --variant "base=mesh.dp=1" --variant "shufpal=mesh.dp=1;$P=pallas" \
  --rounds 3 --steps 6
