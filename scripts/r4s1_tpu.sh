#!/bin/bash
# Round-4 session-1 TPU batch (VERDICT r3 items #2, #5, #8):
#   (a) the PREPARED wgrad contraction-form step A/B, finally run: einsum
#       (default) vs conv form (train.wgrad_form=conv — now a TrainCfg
#       field applied at step-build time) at every preset, interleaved
#       rounds with rotated order per BASELINE.md methodology.
#   (b) music_44k_dp16 dp=1 device profile — the only preset whose time
#       budget is unknown (VERDICT weak #6).
#   (c) dual_stft device profile — the least-optimized flagship-class
#       preset (VERDICT weak #4).
# Usage: bash scripts/r4s1_tpu.sh 2>&1 | tee /tmp/r4s1_tpu.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

W=train.wgrad_form

timeout 3600 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant "base=$W=einsum" \
  --variant "wconv=$W=conv" \
  --rounds 6 --steps 10

timeout 3600 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant "base=$W=einsum" --variant "wconv=$W=conv" --rounds 4 --steps 10

timeout 3600 python scripts/step_ab.py --preset dual_stft \
  --variant "base=$W=einsum" --variant "wconv=$W=conv" --rounds 4 --steps 10

timeout 3600 python scripts/step_ab.py --preset tiny_sc09 \
  --variant "base=$W=einsum" --variant "wconv=$W=conv" --rounds 4 --steps 30

timeout 3600 python scripts/step_ab.py --preset resample_22k \
  --variant "base=$W=einsum" --variant "wconv=$W=conv" --rounds 4 --steps 30

timeout 3600 python scripts/step_ab.py --preset music_44k_dp16 \
  --variant "base=mesh.dp=1;$W=einsum" --variant "wconv=mesh.dp=1;$W=conv" \
  --rounds 3 --steps 6

# (b) music dp=1 profile
timeout 3600 python scripts/profile_step.py --preset music_44k_dp16 \
  --set mesh.dp=1 --steps 3 --top 40

# (c) dual_stft profile
timeout 3600 python scripts/profile_step.py --preset dual_stft \
  --steps 3 --top 40
