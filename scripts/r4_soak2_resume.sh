#!/bin/bash
# Idempotent continuation of r4_soak2.sh (VERDICT r3 #3): resumes the
# 100k-step flagship soak from the latest complete checkpoint in
# /tmp/soak2_r4 instead of wiping the workdir. Safe to relaunch after a
# VM/session restart any number of times; segments whose target step is
# already reached exit immediately (the loop prints [resume] and stops).
# Usage: setsid bash scripts/r4_soak2_resume.sh >> /tmp/r4_soak2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

W=/tmp/soak2_r4
# Drop any checkpoint save that was interrupted mid-write by the crash;
# orbax would refuse to restore from a *-tmp dir anyway.
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
done

echo "===== r4_soak2 done ====="
