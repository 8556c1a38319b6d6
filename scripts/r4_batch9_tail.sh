#!/bin/bash
# Late-bound tail of r4_batch9.sh — trimmed at ~50 min wall: the music
# native-scale proof didn't fit the session budget (recorded as a
# round-5 item); keep the two quick, recordable flows.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

echo "===== (3) sample determinism (fixed flags) ====="
bash scripts/r4_batch9b.sh

echo "===== (4) flagship device profile, final stack ====="
timeout 1200 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3 \
  || echo "PROFILE FAIL"
