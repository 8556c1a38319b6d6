#!/bin/bash
# Loop-level A/B on the real chip (r4 s4): attribute the soak-segment-1
# deficit (BASELINE.md "Soak discovery") between (a) the per-step index
# device_put latency (data.index_chunk=0 vs 512) and (b) the f32/bf16
# dtype confound. Measures the FULL CLI loop (not the staged step
# harness): 260 steps, no checkpoints, median steps/s from metrics.jsonl
# excluding the first (compile) bucket. Runs alternate variants so chip
# drift cancels at the pair level.
# Usage: bash scripts/r4_loop_ab.sh > /tmp/r4_loop_ab.log 2>&1
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

run() {  # run <tag> <dtype> <chunk>
  local W=/tmp/loop_ab_$1
  rm -rf "$W"
  timeout 2400 python -m audiogan_tpu.cli train --preset wgan_gp_b64 \
    --data_dir '' --total_steps 260 --workdir "$W" \
    --set train.ckpt_every=0 --set train.sample_every=0 \
    --set train.log_every=20 \
    --set train.dtype="$2" --set data.index_chunk="$3" \
    || echo "LOOP_AB_FAIL $1"
  python - "$W" "$1" <<'EOF'
import json, sys, statistics
rows = [json.loads(l) for l in open(sys.argv[1] + "/metrics.jsonl")]
r = [x["steps_per_sec"] for x in rows[1:]]  # drop compile bucket
print(f"LOOP_AB RESULT {sys.argv[2]}: median {statistics.median(r):.3f} "
      f"steps/s over {len(r)} buckets (min {min(r):.3f} max {max(r):.3f})")
EOF
}

# alternated pairs: chunked-vs-perstep at bf16 (the claim), then the
# dtype leg at chunk=512, then repeat the bf16 pair
run c512_bf16_a bfloat16 512
run c0_bf16_a   bfloat16 0
run c512_f32    float32  512
run c512_bf16_b bfloat16 512
run c0_bf16_b   bfloat16 0
grep "LOOP_AB RESULT" /tmp/r4_loop_ab.log
echo "===== r4_loop_ab done ====="
