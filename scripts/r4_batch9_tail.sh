#!/bin/bash
# Late-bound tail of r4_batch9.sh — edited while the bench runs so the
# remaining chip budget decides what fits. Current plan (full):
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

echo "===== (3) flagship device profile, final stack ====="
timeout 1500 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3 \
  || echo "PROFILE FAIL"

echo "===== (4) sample determinism (fixed flags) ====="
bash scripts/r4_batch9b.sh

echo "===== (5) music native-scale learning proof ====="
W=/tmp/music_proof_r4
rm -rf "$W"
timeout 2400 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
  --data_dir '' --total_steps 600 --workdir "$W" \
  --set mesh.dp=1 --set train.batch_size=64 \
  --set train.ckpt_every=300 --set train.sample_every=600 \
  || echo "MUSIC_SEG_FAIL"
timeout 1500 python -m audiogan_tpu.cli eval --workdir "$W" --num 16 \
  || echo "MUSIC_EVAL_FAIL"
