#!/bin/bash
# Round-3 session-5 follow-up: scan_unroll A/B across the other presets
# (unroll=5 won +3.1% at the flagship under the no-remat default) before
# flipping the default. One sequential claim; never kill mid-run.
# Usage: bash scripts/r3s5b_tpu.sh 2>&1 | tee /tmp/r3s5b_tpu.log
set -x
cd /root/repo

timeout 1800 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant base --variant "unroll5=train.scan_unroll=5" \
  --rounds 4 --steps 10

timeout 1800 python scripts/step_ab.py --preset dual_stft \
  --variant base --variant "unroll5=train.scan_unroll=5" \
  --rounds 4 --steps 10

timeout 2400 python scripts/music_bench.py --rounds 3 \
  --configs "xla:1:0:1,xla:1:0:5"

timeout 1800 python scripts/step_ab.py --preset tiny_sc09 \
  --variant base --variant "unroll5=train.scan_unroll=5" \
  --rounds 4 --steps 30
