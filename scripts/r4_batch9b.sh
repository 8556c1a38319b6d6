#!/bin/bash
# Follow-up to r4_batch9.sh: the sample-determinism verify flow (batch 9
# step 1 passed --out instead of --out_dir, so the two sample calls
# exited on argparse before claiming the chip). Runs after batch 9's
# queue drains.
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
