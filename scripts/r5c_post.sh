#!/bin/bash
# Post-queue chip work, round 5 — waits for r5b_queue to finish, then:
#   A. dual_stft f0prim decider, sequential mode (attempt 3: attempt 1
#      spilled HBM in the resident harness, attempt 2 hit an axon-relay
#      futex hang inside the ship-gate window and was killed).
#   B. Verify flows 2+3 on HW at final HEAD (tiny CLI train, sample
#      byte-determinism).
#   C. Music clean direct-SIGKILL + resume leg (the stage-B fault
#      injection killed the `timeout` WRAPPER, not the python — SIGKILL
#      is not forwarded — so the trainer survived as an orphan and the
#      run became a dual-writer stress test instead; here the python
#      CHILD is killed directly, then resumed).
# Usage: setsid bash scripts/r5c_post.sh > /tmp/r5c_post.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

# self-watchdog against relay futex hangs
setsid bash scripts/r5_watchdog.sh $$ 900 > /tmp/r5c_watchdog.log 2>&1 &

while ! grep -q "r5b_queue done" /tmp/r5b_queue.log 2>/dev/null; do
  sleep 60
done

# Absolute cutoffs: the driver runs bench.py on this chip at round end
# (~00:10); nothing here may still hold the chip then. Stage A ~12 min,
# B ~8 min, C ~15 min.
NOW() { date +%s; }
T_A=$(date -d "23:52" +%s); T_B=$(date -d "23:56" +%s)
T_C=$(date -d "23:48" +%s)

echo "===== (A) dual f0prim decider, sequential (attempt 3) ====="
if [ "$(NOW)" -gt "$T_A" ]; then
  echo "past cutoff — stage A skipped"; exit 0
fi
timeout 2400 python scripts/step_ab.py --preset dual_stft \
  --variant base --variant "f0prim=model.fused_shuffle_sites=0;model.shuffle_impl=prim" \
  --rounds 4 --steps 16 --sequential \
  2>&1 | tee bench/r5_dual_seq_ab_log.txt || echo "AB_DUAL_SEQ FAIL"
cp -f /tmp/r5c_post.log bench/r5c_post_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5_dual_seq_ab_log.txt bench/r5c_post_log.txt && \
  git commit -m "r5: dual f0prim decider, sequential mode (post-queue)" \
  && break
  sleep 7
done

if [ "$(NOW)" -lt "$T_C" ]; then
echo "===== (C) music clean direct-SIGKILL + resume ====="
M=/tmp/music_r5
LAST=$(ls "$M/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$LAST" ]; then
  TGT=$((LAST + 1000)); KILL_AT=$((LAST + 500))
  timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
    --data_dir '' --total_steps "$TGT" --workdir "$M" \
    --set mesh.dp=1 --set train.batch_size=64 \
    --set train.ckpt_every=250 --set train.sample_every=50000 &
  TPID=$!
  sleep 20
  PYPID=$(awk '{print $1}' "/proc/$TPID/task/$TPID/children" 2>/dev/null)
  while kill -0 "$TPID" 2>/dev/null; do
    STEP=$(tail -1 "$M/metrics.jsonl" 2>/dev/null | grep -o '"step": [0-9]*' \
           | grep -o '[0-9]*')
    if [ -n "$STEP" ] && [ "$STEP" -ge "$KILL_AT" ]; then
      echo "MUSIC_DIRECT_SIGKILL python=$PYPID at step $STEP"
      kill -9 "$PYPID"   # the python CHILD, not the timeout wrapper
      break
    fi
    sleep 20
  done
  wait "$TPID"; echo "direct-kill leg exit: $?"
  ps -ef | grep "cli train" | grep -v grep || echo "no orphan trainer"
  timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
    --data_dir '' --total_steps "$TGT" --workdir "$M" \
    --set mesh.dp=1 --set train.batch_size=64 \
    --set train.ckpt_every=250 --set train.sample_every=50000 \
    || echo "MUSIC_DIRECT_RESUME_FAIL"
  cp -f "$M/metrics.jsonl" bench/music_r5_metrics.jsonl 2>/dev/null
fi
cp -f /tmp/r5c_post.log bench/r5c_post_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5c_post_log.txt bench/music_r5_metrics.jsonl && \
  git commit -m "r5: music direct-SIGKILL+resume witness (kills the python, not the wrapper)" \
  && break
  sleep 7
done
else
  echo "past cutoff — stage C skipped"
fi

if [ "$(NOW)" -lt "$T_B" ]; then
echo "===== (B) verify flows 2+3 at final HEAD ====="
V=/tmp/vrun_r5c
rm -rf "$V" /tmp/vsamp_a /tmp/vsamp_b
timeout 1800 python -m audiogan_tpu.cli train --preset tiny_sc09 \
  --data_dir '' --total_steps 5 --workdir "$V" \
  || echo "VERIFY_TRAIN FAIL"
timeout 1200 python -m audiogan_tpu.cli sample --workdir "$V" --num 4 \
  --seed 0 --out_dir /tmp/vsamp_a || echo "VERIFY_SAMPLE_A FAIL"
timeout 1200 python -m audiogan_tpu.cli sample --workdir "$V" --num 4 \
  --seed 0 --out_dir /tmp/vsamp_b || echo "VERIFY_SAMPLE_B FAIL"
if diff -r /tmp/vsamp_a /tmp/vsamp_b > /dev/null; then
  echo "VERIFY_SAMPLE_DETERMINISM PASS"
else
  echo "VERIFY_SAMPLE_DETERMINISM FAIL"
fi
cp -f /tmp/r5c_post.log bench/r5c_post_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5c_post_log.txt && \
  git commit -m "r5: on-chip verify flows at final HEAD" && break
  sleep 7
done

else
  echo "past cutoff — stage B skipped"
fi

echo "===== r5c_post done ====="
