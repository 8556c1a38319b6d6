#!/bin/bash
# Round-4 soak / convergence-scale run (VERDICT r3 #3): 100k steps of the
# flagship preset through the CLI on the real chip, in four 25k segments —
# each segment boundary is a full process exit + auto-resume (the restart
# path at scale), each followed by an objective eval so the
# spectral_distance trajectory has checkpoints along the way.
# ckpt_every=500 -> 200 orbax saves through the keep-k=3 rotation.
# Usage: bash scripts/r4_soak.sh 2>&1 | tee /tmp/r4_soak.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

W=/tmp/soak_r4
rm -rf "$W"

for S in 25000 50000 75000 100000; do
  # (no /usr/bin/time on this host) poll the trainer's peak RSS from /proc
  # every 2 min — the host-memory trajectory of the metrics/ckpt writers
  # over a multi-hour run is part of what the soak is for
  timeout 14400 python -m audiogan_tpu.cli train \
    --preset wgan_gp_b64 --data_dir '' --total_steps "$S" --workdir "$W" \
    --set train.ckpt_every=500 --set train.sample_every=25000 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    # $PID is the `timeout` shim; the trainer is its child
    CHILD=$(awk '{print $1}' "/proc/$PID/task/$PID/children" 2>/dev/null)
    [ -n "$CHILD" ] && grep VmHWM "/proc/$CHILD/status" 2>/dev/null \
      | sed "s/^/seg$S /"
    sleep 120
  done
  wait "$PID" || echo "SOAK_SEG_FAIL $S"
  ls "$W/checkpoints" | tail -5
  timeout 2400 python -m audiogan_tpu.cli eval --workdir "$W" --num 256 \
    || echo "SOAK_EVAL_FAIL $S"
  wc -c "$W/metrics.jsonl"
done

echo "===== r4_soak done ====="
