#!/bin/bash
# Round-5 chip queue, stage 1: the 100k flagship soak (VERDICT r4 #1).
#
# Lessons encoded from round 4:
#   - EVIDENCE IS DURABLE: after every 25k segment the workdir's
#     metrics.jsonl, the soak_report output, and this log are copied
#     into bench/ and committed — VMs and /tmp die (r4 lost the seg-1
#     raw artifact exactly this way).
#   - The queue is ONE sequential setsid-detached script (never two
#     chip claimants); the tail (scripts/r5_queue_tail.sh) is read by
#     bash only when reached, so later stages can be re-planned while
#     the soak runs.
#   - Segments are idempotent resumes: a segment whose target step is
#     already checkpointed exits immediately, so relaunching after a VM
#     restart is safe (r4_soak2_resume.sh pattern).
#
# Usage: setsid bash scripts/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

W=/tmp/soak_r5
LOG=/tmp/r5_queue.log

persist() {  # persist soak evidence + this log into the repo (r4 lesson)
  cp -f "$W/metrics.jsonl" bench/soak_r5_metrics.jsonl 2>/dev/null
  python scripts/soak_report.py bench/soak_r5_metrics.jsonl "$LOG" \
    > bench/soak_r5_report.txt 2>&1
  cp -f "$LOG" bench/r5_queue_log.txt
  for i in 1 2 3 4 5; do
    git add bench/soak_r5_metrics.jsonl bench/soak_r5_report.txt \
            bench/r5_queue_log.txt && \
    git commit -m "soak r5: evidence checkpoint ($1)" && break
    sleep 7
  done
}

# Drop any checkpoint save interrupted mid-write by a crash; orbax
# refuses *-tmp dirs on restore anyway.
rm -rf "$W"/ckpt/*.orbax-checkpoint-tmp "$W"/ckpt/*.tmp 2>/dev/null

for S in 25000 50000 75000 100000; do
  DONE=$(ls "$W/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "$DONE" ] && [ "$DONE" -ge "$S" ]; then
    echo "seg$S already complete (ckpt $DONE)"; continue
  fi
  timeout 18000 python -m audiogan_tpu.cli train \
    --preset wgan_gp_b64 --data_dir '' --total_steps "$S" --workdir "$W" \
    --set train.dtype=bfloat16 \
    --set train.ckpt_every=500 --set train.sample_every=25000 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    CHILD=$(awk '{print $1}' "/proc/$PID/task/$PID/children" 2>/dev/null)
    [ -n "$CHILD" ] && grep VmHWM "/proc/$CHILD/status" 2>/dev/null \
      | sed "s/^/seg$S /"
    sleep 120
  done
  wait "$PID" || echo "SOAK_SEG_FAIL $S"
  ls "$W/ckpt" | tail -5
  timeout 2400 python -m audiogan_tpu.cli eval --workdir "$W" --num 256 \
    || echo "SOAK_EVAL_FAIL $S"
  wc -c "$W/metrics.jsonl"
  persist "seg$S"
done

echo "===== r5 soak done ====="

# Late-bound tail: read by bash only when execution reaches this line,
# so the remaining stages (music proof, pairwise A/Bs, close bench,
# profiles) can be edited while the soak runs (r4_batch9 pattern).
bash scripts/r5_queue_tail.sh
cp -f "$LOG" bench/r5_queue_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5_queue_log.txt && \
  git commit -m "r5 queue: final log" && break
  sleep 7
done
echo "===== r5_queue done ====="
