#!/bin/bash
# Round-3 session-6 TPU batch, one sequential claim; never kill mid-run.
# 1) conv-lowering roof sweep (the 4-6x headroom hunt, s5's top item)
# 2) scan_unroll=5 A/Bs at the remaining presets (pending default flip)
# Usage: bash scripts/r3s6_tpu.sh 2>&1 | tee /tmp/r3s6_tpu.log
set -x
cd /root/repo

timeout 3600 python scripts/conv_roof.py --sets flagship --rounds 5

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
