#!/bin/bash
# Round-3 session-6 batch B: decompose AUTO's step-level win over xla into
# its routing bands (conv-fwd band, convt band), under the staged harness.
# conv_roof (batch A) showed pallas conv FWD loses 1.25-1.42x at every
# flagship geometry when measured chained+staged, contradicting the old
# transfer-confounded band data — yet auto beats xla +5.4% at step level.
# These ablations find where the step-level win actually lives.
# Usage: bash scripts/r3s6b_tpu.sh 2>&1 | tee /tmp/r3s6b_tpu.log
set -x
cd /root/repo

G=gvar:audiogan_tpu.kernels.conv

timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "noconv=$G._AUTO_CONV_BAND_LO=1000000000" \
  --variant "noconvt=$G._AUTO_CONVT_MIN=1000000000" \
  --variant "xla=train.kernels=xla" \
  --rounds 6 --steps 10

# widen probes: route MORE geometries to pallas than the current bands
timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "convwide=$G._AUTO_CONV_BAND_LO=1;$G._AUTO_CONV_BAND_HI=1000000000" \
  --variant "convtall=$G._AUTO_CONVT_MIN=1" \
  --rounds 5 --steps 10

# phase-shuffle cost probe: gather vs gather-free select form vs OFF
# (shuffle0 changes the math — it is a TIMING diagnostic only)
timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "shufsel=gvar:audiogan_tpu.ops.phase_shuffle._SELECT_IMPL=1" \
  --variant "shuffle0=model.phase_shuffle=0" \
  --rounds 5 --steps 10

# device-side per-op profile of the flagship step (Amdahl-gap hunt);
# graph comes warm from the persistent cache after the step_ab runs
timeout 1800 python scripts/profile_step.py --steps 3 --top 40
