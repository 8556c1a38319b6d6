#!/bin/bash
# Late-bound tail of r4_batch9.sh — final trim (~57 min wall): the
# dual_stft cold remote compile consumed the budget; keep only the
# sample-determinism verify flow (warm cache, ~2 min) so the chip frees
# promptly for the driver's end-of-round bench. The flagship profile,
# music proof, and pairwise A/Bs move to the round-5 queue (WORKLOG).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

echo "===== (3) sample determinism (fixed flags) ====="
bash scripts/r4_batch9b.sh
