#!/bin/bash
# Round-4 TPU batch 2b: re-run of batch 2 on the ALIGNED sconv kernels
# (batch 2's Pallas runs died on Mosaic's sublane-divisibility proof for
# offs-dependent DMA starts; the kernels now DMA aligned tiles and apply
# the whole-row shift in VMEM — see kernels/sconv.py).
#
#   (v) verify flows 2/3/5 first (commit gate for the working tree)
#   (s) SAFE A/Bs: fused sites via the XLA sconv lowering at every preset
#       (batch 2: pure-XLA fused beat pure-XLA base 1.073 at the flagship)
#   (a) sconv exactness witness on HW — scripts/sconv_hw_check.py
#   (p) RISKY A/Bs: the Pallas sconv bands (a Mosaic failure kills only
#       these, the shipping decision is already covered by (s))
# Usage: bash scripts/r4_batch2b.sh 2>&1 | tee /tmp/r4_batch2b.log
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"

echo "===== verify flow 2: tiny train on TPU ====="
rm -rf /tmp/vrun
timeout 1800 python -m audiogan_tpu.cli train --preset tiny_sc09 \
  --data_dir '' --total_steps 5 --workdir /tmp/vrun || echo "FLOW2 FAIL"

echo "===== verify flow 3: sample determinism ====="
timeout 1200 python -m audiogan_tpu.cli sample --workdir /tmp/vrun \
  --num 4 --seed 0 --out_dir /tmp/vrun/s1 || echo "FLOW3 FAIL"
timeout 1200 python -m audiogan_tpu.cli sample --workdir /tmp/vrun \
  --num 4 --seed 0 --out_dir /tmp/vrun/s2 || echo "FLOW3 FAIL"
for f in /tmp/vrun/s1/*.wav; do
  cmp "$f" "/tmp/vrun/s2/$(basename "$f")" || echo "FLOW3 FAIL: $f differs"
done

echo "===== verify flow 5: bench line ====="
timeout 1800 python bench.py || echo "FLOW5 FAIL"
echo "===== VERIFY FLOWS DONE ====="

F=model.fused_shuffle_sites
# fused sites via the XLA sconv lowering, everything else auto:
NOSP="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONV_MIN=1073741824"
NOST="gvar:audiogan_tpu.kernels.sconv._AUTO_SCONVT_MIN=1073741824"

echo "===== SAFE fused-site A/Bs (XLA sconv lowering under auto) ====="
timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "fx1=$F=1;$NOSP;$NOST" \
  --variant "fx2=$F=2;$NOSP;$NOST" \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 6 --steps 10

timeout 3600 python scripts/step_ab.py --preset dual_stft \
  --variant base \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 4 --steps 10

timeout 3600 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant base \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 4 --steps 10

timeout 2400 python scripts/step_ab.py --preset tiny_sc09 \
  --variant base \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 4 --steps 30

timeout 2400 python scripts/step_ab.py --preset resample_22k \
  --variant base \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --rounds 4 --steps 30

echo "===== sconv HW exactness (aligned kernels) ====="
timeout 2400 python scripts/sconv_hw_check.py || echo "SCONV_HW FAIL"

echo "===== RISKY fused-site A/Bs (Pallas sconv bands) ====="
timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base \
  --variant "fxla=$F=-1;$NOSP;$NOST" \
  --variant "fusedall=$F=-1" \
  --rounds 5 --steps 10 || echo "PALLAS_AB_FLAGSHIP FAIL"

timeout 3600 python scripts/step_ab.py --preset dual_stft \
  --variant base \
  --variant "fusedall=$F=-1" \
  --rounds 4 --steps 10 || echo "PALLAS_AB_DUAL FAIL"

echo "===== r4_batch2b done ====="
