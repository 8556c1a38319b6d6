#!/bin/bash
# Round-4 soak v2 (VERDICT r3 #3), restarted on the fixed stack: 100k
# flagship steps through the CLI at the HEADLINE operating point
# (bfloat16 compute — the segment-1 baseline accidentally ran the f32
# preset default, see BASELINE.md "Soak discovery"), with the two loop
# fixes live (data.index_chunk=512 resident index blocks, _AsyncCkpt).
# Four 25k segments; each boundary is a full process exit + auto-resume;
# each segment ends with an objective eval so the spectral_distance
# trajectory has checkpoints. ckpt_every=500 -> 200 orbax keep-k
# rotations. VmHWM polled every 2 min (host-memory trajectory).
# Usage: setsid bash scripts/r4_soak2.sh > /tmp/r4_soak2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

W=/tmp/soak2_r4
rm -rf "$W"

for S in 25000 50000 75000 100000; do
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
