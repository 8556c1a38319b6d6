#!/bin/bash
# Round-4 batch 9 (session 6; fresh VM, cold XLA cache). Re-arms the
# highest-value remnant of the session-5 chip chain that died with the
# VM (soak segs 2-4 + batch6/7/8 never ran). Ordered by value so the
# wall clock, not a timeout, decides the cut line; every timeout is a
# never-fires safety net (killing a TPU claimant wedges the lease).
#   1. verify-skill drive flows 2/3 (tiny train on HW, byte-deterministic
#      sampling) — the session's build-and-drive record
#   2. bench --preset all on the FINAL r4 stack (sconv fused sites +
#      wgrad conv form + bf16 defaults) — the round table refresh
#   3. flagship device profile on the final stack (what's left after
#      the r4 wins; seeds round-5 targets)
#   4. music [B:11] native-scale learning proof, trimmed from batch8:
#      1200 steps @ dp=1 with a mid-run process exit + resume at 600,
#      then eval (prior best: 150 steps)
#   5. pending pairwise fused-shuffle A/Bs (cond_gru, music) — confirm
#      the shipped fused-all defaults pairwise like the flagship was
# Usage: bash scripts/r4_batch9.sh > /tmp/r4_batch9.log 2>&1
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

echo "===== (1) verify flows: tiny train + sample determinism ====="
V=/tmp/vrun_r4s6
rm -rf "$V"
timeout 1500 python -m audiogan_tpu.cli train --preset tiny_sc09 \
  --data_dir '' --total_steps 5 --workdir "$V" || echo "VERIFY_TRAIN FAIL"
timeout 1200 python -m audiogan_tpu.cli sample --workdir "$V" --num 4 --seed 0 \
  --out /tmp/vsamp_a || echo "VERIFY_SAMPLE_A FAIL"
timeout 1200 python -m audiogan_tpu.cli sample --workdir "$V" --num 4 --seed 0 \
  --out /tmp/vsamp_b || echo "VERIFY_SAMPLE_B FAIL"
if diff -r /tmp/vsamp_a /tmp/vsamp_b > /dev/null; then
  echo "VERIFY_SAMPLE_DETERMINISM PASS"
else
  echo "VERIFY_SAMPLE_DETERMINISM FAIL"
fi

echo "===== (2) bench refresh, all presets, final r4 stack ====="
timeout 3000 python bench.py --preset all || echo "BENCH FAIL"

echo "===== (3+) late-bound tail ====="
bash scripts/r4_batch9_tail.sh

echo "===== r4_batch9 done ====="
