#!/bin/bash
# Follow-up to r4_batch9.sh — CORRECTION (advisor r4): batch 9's sample
# calls passed --out, which argparse prefix-abbreviation resolved to
# --out_dir, so they ran fine (bench/r4_batch9_log.txt shows both calls
# succeeding and VERIFY_SAMPLE_DETERMINISM PASS). This rerun was
# redundant; it's kept as a second PASS datapoint. Scripts should spell
# the full --out_dir flag so the evidence trail stays unambiguous.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

V=/tmp/vrun_r4s6
timeout 1200 python -m audiogan_tpu.cli sample --workdir "$V" --num 4 --seed 0 \
  --out_dir /tmp/vsamp_a || echo "VERIFY_SAMPLE_A FAIL"
timeout 1200 python -m audiogan_tpu.cli sample --workdir "$V" --num 4 --seed 0 \
  --out_dir /tmp/vsamp_b || echo "VERIFY_SAMPLE_B FAIL"
if diff -r /tmp/vsamp_a /tmp/vsamp_b > /dev/null; then
  echo "VERIFY_SAMPLE_DETERMINISM PASS"
else
  echo "VERIFY_SAMPLE_DETERMINISM FAIL"
fi
echo "===== r4_batch9b done ====="
