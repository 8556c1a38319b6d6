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

echo "===== (3) flagship device profile, final stack ====="
timeout 1500 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3 \
  || echo "PROFILE FAIL"

echo "===== (4) music native-scale learning proof (trimmed batch8) ====="
W=/tmp/music_proof_r4
rm -rf "$W"
for S in 600 1200; do
  timeout 2400 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
    --data_dir '' --total_steps "$S" --workdir "$W" \
    --set mesh.dp=1 --set train.batch_size=64 \
    --set train.ckpt_every=300 --set train.sample_every=1200 \
    || echo "MUSIC_SEG_FAIL $S"
done
timeout 1800 python -m audiogan_tpu.cli eval --workdir "$W" --num 32 \
  || echo "MUSIC_EVAL_FAIL"

echo "===== (5) pending pairwise fused-shuffle A/Bs ====="
timeout 1800 python scripts/step_ab.py --preset cond_gru_sc09 \
  --rounds 3 --steps 10 \
  --variant fxla=model.fused_shuffle_sites=-1 \
  --variant fx1=model.fused_shuffle_sites=1 || echo "AB_GRU FAIL"
timeout 1800 python scripts/step_ab.py --preset music_44k_dp16 \
  --rounds 2 --steps 6 \
  --variant fxla="model.fused_shuffle_sites=-1;mesh.dp=1" \
  --variant fx1="model.fused_shuffle_sites=1;mesh.dp=1" || echo "AB_MUSIC FAIL"

echo "===== r4_batch9 done ====="
