#!/bin/bash
# Round-4 batch 8 (after batch 7): deep learning evidence at the two
# scales that had the least of it, plus the on-HW kernel suite record.
#   1. music_44k @ dp=1, 5000 steps via the CLI (prior best: 150 steps)
#      — [B:11] at native 4 s / 44.1 kHz geometry on the final r4 stack
#      (wgrad conv form + all-site fused shuffle + bf16), with a
#      mid-run process exit + resume at 2500, then eval @5000.
#   2. cond_gru 10k-step extension (prior: 1200) + eval.
#   3. tests_tpu kernel equivalence suite on the final stack.
# Usage: setsid bash scripts/r4_batch8.sh > /tmp/r4_batch8.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

W=/tmp/music_proof_r4
rm -rf "$W"
for S in 2500 5000; do
  timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
    --data_dir '' --total_steps "$S" --workdir "$W" \
    --set mesh.dp=1 --set train.batch_size=64 \
    --set train.ckpt_every=500 --set train.sample_every=5000 \
    || echo "MUSIC_SEG_FAIL $S"
done
timeout 2400 python -m audiogan_tpu.cli eval --workdir "$W" --num 128 \
  || echo "MUSIC_EVAL_FAIL"

G=/tmp/gru_proof_r4
rm -rf "$G"
timeout 7200 python -m audiogan_tpu.cli train --preset cond_gru_sc09 \
  --data_dir '' --total_steps 10000 --workdir "$G" \
  --set model.model_dim=32 --set model.gru_hidden=256 \
  --set train.batch_size=32 \
  --set train.ckpt_every=1000 --set train.sample_every=10000 \
  || echo "GRU_FAIL"
timeout 2400 python -m audiogan_tpu.cli eval --workdir "$G" --num 256 \
  || echo "GRU_EVAL_FAIL"

echo "===== (3) tests_tpu kernel suite ====="
timeout 5400 make tpu-kernels || echo "TPU_KERNELS FAIL"

echo "===== r4_batch8 done ====="
