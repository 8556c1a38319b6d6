#!/bin/bash
# Round-5 chip queue, part B — the stages the 2026-08-20 VM recycle cut
# off mid-music (the r5_queue_tail.sh music stage was SIGKILLed at step
# 1200 by design, but the VM died before the resume leg ran and the
# checkpoint lived in /tmp). Order:
#   A. dual/cond_gru f0prim deciders (cheap; unblocks the ship flip that
#      stage D's close bench must reflect) + flagship fx1 re-check.
#   B. Music native-scale proof, from scratch (VERDICT r4 #3): 2500
#      steps @ dp=1 batch 64 through the CLI, SIGKILL @ >=1200, resume
#      to 2500, eval. (Extension to 5000 is stage G, deadline-gated.)
#   C. Ship gate: wait for /tmp/r5b_ship_ack — the build session flips
#      config.py defaults per stage-A verdicts while B runs, so D's
#      graphs ARE the shipped graphs.
#   D. Close bench, all 6 presets, into a CLEAN cache dir (the minimal
#      seed set).  E. Seed harvest -> bench/xla_cache_seed/ (fresh-VM
#      cold-start, VERDICT r4 #5).  F. MFU scoreboard (VERDICT r4 #8;
#      warm via the harvest cache).  G. Deadline-gated extras: music
#      5000+eval, AUTO band re-check, post-fdv profiles.
# Lessons encoded: one sequential setsid queue (never two chip
# claimants); per-stage persist+commit (VMs die); idempotent resumes;
# watchdog handles axon-relay futex hangs (scripts/r5_watchdog.sh).
#
# Usage: setsid bash scripts/r5b_queue.sh > /tmp/r5b_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
LOG=/tmp/r5b_queue.log
START=$(date +%s)
DEADLINE=$((START + 9600))   # extras only before T+160min

plog() {
  cp -f "$LOG" bench/r5b_queue_log.txt
  for i in 1 2 3 4 5; do
    git add bench/r5b_queue_log.txt "$@" && \
    git commit -m "r5b queue: $COMMIT_MSG" && break
    sleep 7
  done
}

echo "===== (A) dual/cond_gru f0prim deciders + flagship fx1 re-check ====="
F=model.fused_shuffle_sites
{
  timeout 4800 python scripts/step_ab.py --preset cond_gru_sc09 \
    --variant base --variant "f0prim=$F=0;model.shuffle_impl=prim" \
    --rounds 6 --steps 10 || echo "AB_F0PRIM_CONDGRU FAIL"
  timeout 4800 python scripts/step_ab.py --preset dual_stft \
    --variant base --variant "f0prim=$F=0;model.shuffle_impl=prim" \
    --rounds 5 --steps 8 || echo "AB_F0PRIM_DUAL FAIL"
  timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
    --variant base --variant "fx1=$F=1" \
    --rounds 6 --steps 10 || echo "AB_SCONV_FLAGSHIP FAIL"
} 2>&1 | tee bench/r5_f0prim_ab_log.txt
COMMIT_MSG="dual/cond_gru f0prim decider + flagship fx1 re-check evidence"
plog bench/r5_f0prim_ab_log.txt

echo "===== (B) music native-scale proof (restart; ckpt died with the VM) ====="
M=/tmp/music_r5
rm -rf "$M"
mpersist() {
  cp -f "$M/metrics.jsonl" bench/music_r5_metrics.jsonl 2>/dev/null
  COMMIT_MSG="music proof evidence ($1)"
  plog bench/music_r5_metrics.jsonl
}
timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
  --data_dir '' --total_steps 2500 --workdir "$M" \
  --set mesh.dp=1 --set train.batch_size=64 \
  --set train.ckpt_every=250 --set train.sample_every=5000 &
MPID=$!
while kill -0 "$MPID" 2>/dev/null; do
  STEP=$(tail -1 "$M/metrics.jsonl" 2>/dev/null | grep -o '"step": [0-9]*' \
         | grep -o '[0-9]*')
  if [ -n "$STEP" ] && [ "$STEP" -ge 1200 ]; then
    # BUG (kept for the record, fixed in r5c_post.sh): $MPID is the
    # `timeout` WRAPPER; SIGKILL is not forwardable, so this orphaned
    # the python trainer and the leg became a dual-writer stress test
    # (bit-identical streams, zero damage — BASELINE.md music section).
    # Kill the python CHILD of $MPID to actually kill the trainer.
    echo "MUSIC_SIGKILL at step $STEP"; kill -9 "$MPID"; break
  fi
  sleep 30
done
wait "$MPID"; echo "music stage-A exit: $?"
mpersist "pre-resume (killed ~1200)"
# resume to 2500 (timeout budgets a possible ~30 min lease wedge)
timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
  --data_dir '' --total_steps 2500 --workdir "$M" \
  --set mesh.dp=1 --set train.batch_size=64 \
  --set train.ckpt_every=250 --set train.sample_every=5000 \
  || echo "MUSIC_RESUME_FAIL"
timeout 2400 python -m audiogan_tpu.cli eval --workdir "$M" --num 128 \
  || echo "MUSIC_EVAL_FAIL 2500"
mpersist "2500+eval"

echo "===== (C) ship gate (config flips from stage-A verdicts) ====="
for i in $(seq 1 50); do
  [ -f /tmp/r5b_ship_ack ] && { echo "ship ack: $(cat /tmp/r5b_ship_ack)"; break; }
  sleep 30
done
git log --oneline -3

echo "===== (D) round-5 close bench: all 6 presets, clean cache dir ====="
rm -rf /tmp/xla_seed_harvest
timeout 10800 env AUDIOGAN_XLA_CACHE=/tmp/xla_seed_harvest \
  AUDIOGAN_XLA_SEED=0 python bench.py --preset all \
  2>&1 | tee bench/r5_close_bench_log.txt || echo "CLOSE_BENCH FAIL"
COMMIT_MSG="close bench, all presets, interleaved-median headline"
plog bench/r5_close_bench_log.txt

echo "===== (E) harvest XLA cache seeds (fresh-VM cold-start) ====="
timeout 1200 python scripts/harvest_xla_seed.py \
  --cache_dir /tmp/xla_seed_harvest --commit || echo "HARVEST FAIL"

echo "===== (F) per-preset MFU scoreboard ====="
timeout 7200 env AUDIOGAN_XLA_CACHE=/tmp/xla_seed_harvest \
  AUDIOGAN_XLA_SEED=0 python scripts/mfu_report.py --presets all \
  2>&1 | tee bench/r5_mfu_report.txt || echo "MFU FAIL"
COMMIT_MSG="per-preset MFU vs the measured 163.8 TF/s roof"
plog bench/r5_mfu_report.txt

echo "===== (G) deadline-gated extras ====="
if [ "$(date +%s)" -lt "$DEADLINE" ]; then
  timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
    --data_dir '' --total_steps 5000 --workdir "$M" \
    --set mesh.dp=1 --set train.batch_size=64 \
    --set train.ckpt_every=250 --set train.sample_every=5000 \
    || echo "MUSIC_SEG2_FAIL"
  timeout 2400 python -m audiogan_tpu.cli eval --workdir "$M" --num 128 \
    || echo "MUSIC_EVAL_FAIL 5000"
  mpersist "5000+eval"
else
  echo "deadline passed — music 5000 extension skipped"
fi
if [ "$(date +%s)" -lt "$DEADLINE" ]; then
  timeout 3600 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3 \
    2>&1 | tee bench/r5_profile_flagship_fdv.txt || echo "PROFILE_FDV FAIL"
  COMMIT_MSG="post-fdv flagship device profile"
  plog bench/r5_profile_flagship_fdv.txt
fi

COMMIT_MSG="final log"
plog
echo "===== r5b_queue done ====="
