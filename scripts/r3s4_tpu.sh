#!/bin/bash
# Round-3 session-4 TPU measurement batch: run sequentially, ONE claim at
# a time, never killed mid-run (axon stale-lease gotcha — WORKLOG).
# Usage: bash scripts/r3s4_tpu.sh 2>&1 | tee /tmp/r3s4_tpu.log
set -x
cd /root/repo

# 1. Staged 4-tier flagship step compare (the step_ab harness now stages
#    inputs on device — clean +-0.2% error bars per the input-transfer
#    discovery). Variants: shipped auto, uniform xla, uniform pallas,
#    mixed (G=pallas, D=xla).
timeout 1800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant auto \
  --variant "xla=train.kernels=xla" \
  --variant "pallas=train.kernels=pallas" \
  --variant "mixed=train.kernels=xla;train.kernels_g=pallas" \
  --rounds 8 --steps 10

# 2. Critic-path decomposition, both tiers (where does uniform pallas
#    lose under the clean harness?)
timeout 1500 python scripts/d_path_bench.py --rounds 6

# 3. Concat probe: one batch-128 critic pass vs two batch-64 passes.
timeout 1200 python scripts/concat_probe.py --rounds 6 --iters 20 --kernels auto
timeout 1200 python scripts/concat_probe.py --rounds 6 --iters 20 --kernels xla

# 4. Music staged re-tune: remat x chunks under the staged harness.
timeout 2400 python scripts/music_bench.py --rounds 3 \
  --configs "xla:1:1,xla:1:0,xla:4:1,auto:1:1"

# 5. Headline bench (driver line) + sampling metric.
timeout 1200 python bench.py
