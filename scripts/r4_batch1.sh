#!/bin/bash
# Round-4 TPU batch 1: verify-skill drive flows (train/sample/bench) first,
# then the r4s1 measurement batch (wgrad-form A/Bs, music+dual profiles),
# then the fused-shuffle-sites XLA-tier step A/B (VERDICT r3 #1 stage 1).
# Usage: bash scripts/r4_batch1.sh 2>&1 | tee /tmp/r4_batch1.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

echo "===== verify flow 2: tiny train on TPU ====="
rm -rf /tmp/vrun
timeout 1200 python -m audiogan_tpu.cli train --preset tiny_sc09 \
  --data_dir '' --total_steps 5 --workdir /tmp/vrun || echo "FLOW2 FAIL"

echo "===== verify flow 3: sample determinism ====="
timeout 1200 python -m audiogan_tpu.cli sample --workdir /tmp/vrun \
  --num 4 --seed 0 --out_dir /tmp/vrun/s1 || echo "FLOW3a FAIL"
timeout 1200 python -m audiogan_tpu.cli sample --workdir /tmp/vrun \
  --num 4 --seed 0 --out_dir /tmp/vrun/s2 || echo "FLOW3b FAIL"
for f in /tmp/vrun/s1/*.wav; do
  cmp "$f" "/tmp/vrun/s2/$(basename "$f")" || echo "FLOW3 MISMATCH $f"
done

echo "===== verify flow 5: bench ====="
timeout 2400 python bench.py || echo "FLOW5 FAIL"

echo "===== fused-shuffle HW exactness (sconv primitives compile+match) ====="
timeout 1800 python scripts/sconv_hw_check.py || echo "SCONV_HW FAIL"

echo "===== r4s1 measurement batch ====="
bash scripts/r4s1_tpu.sh

echo "===== fused-shuffle-sites XLA-tier step A/B ====="
timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "fused1=model.fused_shuffle_sites=1" \
  --variant "fusedall=model.fused_shuffle_sites=-1" \
  --rounds 4 --steps 10

echo "===== r4_batch1 done ====="
