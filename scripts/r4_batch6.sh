#!/bin/bash
# Round-4 batch 6 (post-soak HW queue):
#   1. pending pairwise fused-shuffle A/Bs (cond_gru, music: fx1 vs fxla —
#      the shipped default is fxla there from 3-variant rounds; confirm
#      pairwise like the flagship decision was)
#   2. fresh flagship device profile on the final r4 stack (sconv fused
#      site, wgrad conv form, index_chunk) — decompose what's left
#   3. bench --preset all refresh for the round table
# Usage: setsid bash scripts/r4_batch6.sh > /tmp/r4_batch6.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

# 1a. cond_gru: fused-all (shipped, -1) vs first-site-only
timeout 3600 python scripts/step_ab.py --preset cond_gru_sc09 \
  --rounds 4 --steps 10 \
  --variant fxla=model.fused_shuffle_sites=-1 \
  --variant fx1=model.fused_shuffle_sites=1

# 1b. music: fused-all (shipped) vs first-site-only, dp=1
timeout 3600 python scripts/step_ab.py --preset music_44k_dp16 \
  --rounds 3 --steps 6 \
  --variant fxla="model.fused_shuffle_sites=-1;mesh.dp=1" \
  --variant fx1="model.fused_shuffle_sites=1;mesh.dp=1"

# 2. flagship device profile, final stack
timeout 2400 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3

# 3. bench refresh (all six presets, shipped defaults)
timeout 7200 python bench.py --preset all

echo "===== r4_batch6 done ====="
