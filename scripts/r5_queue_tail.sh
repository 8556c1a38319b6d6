#!/bin/bash
# Round-5 chip queue, tail — read by bash only when the soak completes,
# so it can be edited while stage 1 runs.
# Order (glue-hunt inputs first, so the builder can iterate while the
# long music proof runs):
#   4. Flagship device profile on the current stack (input to the r5
#      glue hunt, VERDICT r4 #4).
#   5. fused_d_views step A/Bs (first glue lever verdict).
#   2. Music native-scale proof (VERDICT r4 #3): 5000 steps of
#      music_44k_dp16 @ dp=1 batch 64 through the CLI, with a mid-run
#      SIGKILL (~step 1200) + resume, an eval at 2500 and at 5000.
#      NOTE: kill -9 on a chip-claiming process can wedge the next
#      claim ~30 min (WORKLOG known-facts); the resume leg's timeout
#      budgets for it.
#   3. Pending fused-shuffle pairwise A/Bs (VERDICT r4 #6): cond_gru
#      and music fxla (shipped -1) vs fx1 vs f0, interleaved pairwise.
#   6. Per-preset MFU scoreboard; 7. all-preset close bench (into a
#      clean cache dir); 8. XLA seed harvest. Chip FREE after this.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
LOG=/tmp/r5_queue.log

mpersist() {
  cp -f "$M/metrics.jsonl" bench/music_r5_metrics.jsonl 2>/dev/null
  cp -f "$LOG" bench/r5_queue_log.txt
  for i in 1 2 3 4 5; do
    git add bench/music_r5_metrics.jsonl bench/r5_queue_log.txt && \
    git commit -m "music r5: evidence checkpoint ($1)" && break
    sleep 7
  done
}

echo "===== (0) finish the soak if the hung seg-4 client left it short ====="
# 2026-08-20 08:20: the seg-4 train client hung at step 96500 — futex-wait
# on a response the axon relay never delivered (metrics/ckpt frozen 45 min,
# utime flat, tunnel socket ESTAB but idle). SIGKILLed by the build session;
# this stage idempotently resumes from the last complete ckpt to 100k.
# Retries budget for the post-SIGKILL lease wedge (~30 min, WORKLOG).
W=/tmp/soak_r5
spersist() {
  cp -f "$W/metrics.jsonl" bench/soak_r5_metrics.jsonl 2>/dev/null
  python scripts/soak_report.py bench/soak_r5_metrics.jsonl "$LOG" \
    > bench/soak_r5_report.txt 2>&1
  cp -f "$LOG" bench/r5_queue_log.txt
  for i in 1 2 3 4 5; do
    git add bench/soak_r5_metrics.jsonl bench/soak_r5_report.txt \
            bench/r5_queue_log.txt && \
    git commit -m "soak r5: evidence checkpoint ($1)" && break
    sleep 7
  done
}
for ATT in 1 2 3; do
  DONE=$(ls "$W/ckpt" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "$DONE" ] && [ "$DONE" -ge 100000 ]; then
    echo "soak complete (ckpt $DONE)"; break
  fi
  rm -rf "$W"/ckpt/*.orbax-checkpoint-tmp "$W"/ckpt/*.tmp 2>/dev/null
  timeout 7200 python -m audiogan_tpu.cli train \
    --preset wgan_gp_b64 --data_dir '' --total_steps 100000 --workdir "$W" \
    --set train.dtype=bfloat16 \
    --set train.ckpt_every=500 --set train.sample_every=25000 \
    || echo "SOAK_FINISH_ATTEMPT_$ATT FAIL"
  sleep 60
done
timeout 2400 python -m audiogan_tpu.cli eval --workdir "$W" --num 256 \
  || echo "SOAK_EVAL_FAIL 100000-finish"
spersist "seg100000-finish"

echo "===== (4) flagship device profile (glue-hunt input) ====="
timeout 3600 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3 \
  2>&1 | tee bench/r5_profile_flagship.txt || echo "PROFILE FAIL"
for i in 1 2 3 4 5; do
  git add bench/r5_profile_flagship.txt && \
  git commit -m "r5: flagship device profile on the r4-final stack" && break
  sleep 7
done

echo "===== (5) fused_d_views step A/Bs (glue hunt, VERDICT r4 #4) ====="
# One 2B critic call for real+fake: merges the two forward stacks and the
# two parameter-backward passes (the add_any accumulation). Verdict per
# preset decides the shipped default (exactness pinned on CPU in
# tests/train/test_fused_views.py).
FD=train.fused_d_views
{
  timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
    --variant base --variant "fdv=$FD=1" --rounds 6 --steps 10 \
    || echo "AB_FDV_FLAGSHIP FAIL"
  timeout 4800 python scripts/step_ab.py --preset cond_gru_sc09 \
    --variant base --variant "fdv=$FD=1" --rounds 6 --steps 10 \
    || echo "AB_FDV_CONDGRU FAIL"
  timeout 4800 python scripts/step_ab.py --preset dual_stft \
    --variant base --variant "fdv=$FD=1" --rounds 5 --steps 8 \
    || echo "AB_FDV_DUAL FAIL"
  timeout 4800 python scripts/step_ab.py --preset music_44k_dp16 \
    --variant base --variant "fdv=$FD=1" --rounds 4 --steps 6 \
    || echo "AB_FDV_MUSIC FAIL"
} 2>&1 | tee bench/r5_fdv_ab_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5_fdv_ab_log.txt bench/r5_queue_log.txt && \
  git commit -m "r5: fused_d_views step A/B evidence" && break
  sleep 7
done

echo "===== (5b) pshuf-primitive shuffle-transpose A/Bs (r5 glue lever) ====="
# _SELECT_IMPL=2 routes unfused shuffle sites through the pshuf/pshuft
# primitive pair (hand-written single-write transpose instead of AD's
# (2rad+1)-term padded chain; step bit-identity pinned by
# tests/train/test_shuffle_impl.py). Flagship ships fused_shuffle_sites=1,
# so sites 2-4 are the census's 1.4 GB/step add_any+pad chains; cond_gru
# ships -1 (no unfused sites) so it is NOT a candidate; music ships -1 too
# — A/B it at f0 spelled prim to see if prim-unfused beats fused-all.
PSI=gvar:audiogan_tpu.ops.phase_shuffle._SELECT_IMPL
{
  timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
    --variant base --variant "prim=$PSI=2" --rounds 6 --steps 10 \
    || echo "AB_PSHUF_FLAGSHIP FAIL"
  timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
    --variant "f0=model.fused_shuffle_sites=0" \
    --variant "f0prim=model.fused_shuffle_sites=0;$PSI=2" \
    --rounds 6 --steps 10 || echo "AB_PSHUF_F0 FAIL"
  timeout 4800 python scripts/step_ab.py --preset music_44k_dp16 \
    --variant base \
    --variant "f0prim=model.fused_shuffle_sites=0;$PSI=2" \
    --rounds 4 --steps 6 || echo "AB_PSHUF_MUSIC FAIL"
} 2>&1 | tee bench/r5_pshuf_ab_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5_pshuf_ab_log.txt && \
  git commit -m "r5: pshuf-primitive shuffle-transpose A/B evidence" && break
  sleep 7
done

echo "===== (5c) mrpad-primitive fused-site transpose A/Bs (r5 glue lever) ====="
# _MRPAD_PRIM=1 routes the FUSED shuffle sites' masked-reflect-pad through
# a linear primitive pair with a hand-written single-write transpose (AD's
# form is split + two full-width zero-padded add_any terms — the census's
# dominant fused-site glue; 2 x 3.3 GB/step at music site 1). Gated on the
# CPU bit-identity validation marker written by the build session.
MRP=gvar:audiogan_tpu.kernels.sconv._MRPAD_PRIM
if [ -f /tmp/mrpad_validated ]; then
  {
    timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
      --variant base --variant "mrp=$MRP=1" --rounds 6 --steps 10 \
      || echo "AB_MRPAD_FLAGSHIP FAIL"
    timeout 4800 python scripts/step_ab.py --preset music_44k_dp16 \
      --variant base --variant "mrp=$MRP=1" --rounds 4 --steps 6 \
      || echo "AB_MRPAD_MUSIC FAIL"
    timeout 4800 python scripts/step_ab.py --preset dual_stft \
      --variant base --variant "mrp=$MRP=1" --rounds 5 --steps 8 \
      || echo "AB_MRPAD_DUAL FAIL"
    # combined levers: flagship/dual ship fused site 1 + unfused sites 2-4,
    # so mrpad (fused backward) and pshuf (unfused backward) compose;
    # census: flagship 4136 -> 697 MB/step of add_any writes with both.
    timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
      --variant base --variant "both=$MRP=1;$PSI=2" --rounds 6 --steps 10 \
      || echo "AB_MRPAD_BOTH_FLAGSHIP FAIL"
    timeout 4800 python scripts/step_ab.py --preset dual_stft \
      --variant base --variant "both=$MRP=1;$PSI=2" --rounds 5 --steps 8 \
      || echo "AB_MRPAD_BOTH_DUAL FAIL"
    # cond_gru ships -1 (all sites fused) -> mrpad-only candidate
    timeout 4800 python scripts/step_ab.py --preset cond_gru_sc09 \
      --variant base --variant "mrp=$MRP=1" --rounds 6 --steps 10 \
      || echo "AB_MRPAD_CONDGRU FAIL"
    # f0+prim candidate (flagship's 5b winner: +10.5% over f0 == shipped
    # base under fdv — unfuse every sconv site and run the pshuf
    # primitive everywhere) for the other two critic presets
    timeout 4800 python scripts/step_ab.py --preset dual_stft \
      --variant base --variant "f0prim=model.fused_shuffle_sites=0;$PSI=2" \
      --rounds 5 --steps 8 || echo "AB_F0PRIM_DUAL FAIL"
    timeout 4800 python scripts/step_ab.py --preset cond_gru_sc09 \
      --variant base --variant "f0prim=model.fused_shuffle_sites=0;$PSI=2" \
      --rounds 6 --steps 10 || echo "AB_F0PRIM_CONDGRU FAIL"
  } 2>&1 | tee bench/r5_mrpad_ab_log.txt
  for i in 1 2 3 4 5; do
    git add bench/r5_mrpad_ab_log.txt && \
    git commit -m "r5: mrpad-primitive fused-site transpose A/B evidence" \
    && break
    sleep 7
  done
else
  echo "mrpad NOT validated on CPU in time — stage skipped"
fi

echo "===== (2) music native-scale proof ====="
M=/tmp/music_r5
rm -rf "$M"
timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
  --data_dir '' --total_steps 2500 --workdir "$M" \
  --set mesh.dp=1 --set train.batch_size=64 \
  --set train.ckpt_every=250 --set train.sample_every=5000 &
MPID=$!
# SIGKILL mid-run once metrics show step >= 1200 (fault injection at
# native scale; tests/train pin bit-exact resume, this is the HW witness)
while kill -0 "$MPID" 2>/dev/null; do
  STEP=$(tail -1 "$M/metrics.jsonl" 2>/dev/null | grep -o '"step": [0-9]*' \
         | grep -o '[0-9]*')
  if [ -n "$STEP" ] && [ "$STEP" -ge 1200 ]; then
    echo "MUSIC_SIGKILL at step $STEP"; kill -9 "$MPID"; break
  fi
  sleep 30
done
wait "$MPID"; echo "music stage-A exit: $?"
mpersist "pre-resume (killed ~1200)"
# resume to 2500 (timeout budgets a possible ~30 min lease wedge)
timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
  --data_dir '' --total_steps 2500 --workdir "$M" \
  --set mesh.dp=1 --set train.batch_size=64 \
  --set train.ckpt_every=250 --set train.sample_every=5000 \
  || echo "MUSIC_RESUME_FAIL"
timeout 2400 python -m audiogan_tpu.cli eval --workdir "$M" --num 128 \
  || echo "MUSIC_EVAL_FAIL 2500"
mpersist "2500+eval"
# continue clean to 5000, eval
timeout 7200 python -m audiogan_tpu.cli train --preset music_44k_dp16 \
  --data_dir '' --total_steps 5000 --workdir "$M" \
  --set mesh.dp=1 --set train.batch_size=64 \
  --set train.ckpt_every=250 --set train.sample_every=5000 \
  || echo "MUSIC_SEG2_FAIL"
timeout 2400 python -m audiogan_tpu.cli eval --workdir "$M" --num 128 \
  || echo "MUSIC_EVAL_FAIL 5000"
mpersist "5000+eval"

echo "===== (3) sconv fused-site re-adjudication under the r5 stack ====="
# The r4 pending pairwise (cond_gru/music fxla-vs-fx1) is moot: under
# fused_d_views the 5b/5c legs re-decided the shuffle lowering outright
# (flagship/music ship f0+prim). What remains open: does fusing a site
# into its conv (sconv) pay ON TOP of the prim impl at the presets'
# final defaults? Pairwise, each preset's shipped config as base.
F=model.fused_shuffle_sites
# deciders for the two presets still on r4 defaults (their 5c f0prim
# legs were edited in after bash had parsed the block and never ran):
# base = shipped (cond_gru fxla-fused / dual fx1-fused, select impl)
# vs the flagship/music winner (no sconv sites + pshuf primitive).
timeout 4800 python scripts/step_ab.py --preset dual_stft \
  --variant base --variant "f0prim=$F=0;model.shuffle_impl=prim" \
  --rounds 5 --steps 8 || echo "AB_F0PRIM_DUAL FAIL"
timeout 4800 python scripts/step_ab.py --preset cond_gru_sc09 \
  --variant base --variant "f0prim=$F=0;model.shuffle_impl=prim" \
  --rounds 6 --steps 10 || echo "AB_F0PRIM_CONDGRU FAIL"
# does fusing a site back IN (sconv) pay on top of prim at the
# flagship's final default?
timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
  --variant base --variant "fx1=$F=1" \
  --rounds 6 --steps 10 || echo "AB_SCONV_FLAGSHIP FAIL"
cp -f "$LOG" bench/r5_queue_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5_queue_log.txt && \
  git commit -m "r5 queue: fused-shuffle A/B evidence" && break
  sleep 7
done

echo "===== (3b) AUTO router-band re-check on the current stack (VERDICT r4 #6) ====="
# Bands were last measured pre-sconv/pre-wgrad-flip (r3s6b: empty conv1d
# band, convt m_out>=64 carried +9.1%). Re-check both edges pairwise at
# the final operating point (pairwise — 3 resident batch-64 graphs OOM'd
# in r4 batch 3). noconvt empties the convt band (= uniform xla routing);
# convtall widens it to every convt.
CB=gvar:audiogan_tpu.kernels.conv._AUTO_CONVT_MIN
{
  timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
    --variant base --variant "noconvt=$CB=99999" --rounds 6 --steps 10 \
    || echo "AB_BAND_NOCONVT FAIL"
  timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
    --variant base --variant "convtall=$CB=1" --rounds 6 --steps 10 \
    || echo "AB_BAND_CONVTALL FAIL"
  timeout 4800 python scripts/step_ab.py --preset wgan_gp_b64 \
    --variant base \
    --variant "convband=gvar:audiogan_tpu.kernels.conv._AUTO_CONV_BAND_HI=512" \
    --rounds 6 --steps 10 || echo "AB_BAND_CONV FAIL"
} 2>&1 | tee bench/r5_band_ab_log.txt
for i in 1 2 3 4 5; do
  git add bench/r5_band_ab_log.txt && \
  git commit -m "r5: AUTO router-band re-check A/B evidence" && break
  sleep 7
done

echo "===== (6) per-preset MFU scoreboard (VERDICT r4 #8) ====="
timeout 7200 python scripts/mfu_report.py --presets all \
  2>&1 | tee bench/r5_mfu_report.txt || echo "MFU FAIL"
for i in 1 2 3 4 5; do
  git add bench/r5_mfu_report.txt && \
  git commit -m "r5: per-preset MFU vs the measured 163.8 TF/s roof" && break
  sleep 7
done

echo "===== (7) round-5 close bench: all 6 presets, drift-robust ====="
# Fresh cache dir (seeds off): after this stage it holds EXACTLY the six
# shipped preset graphs (bf16 step + sample) and nothing else — the
# minimal seed set stage 8 snapshots for fresh-VM cold-start. Compiles
# land before each timing window, so the bench numbers are unaffected.
timeout 10800 env AUDIOGAN_XLA_CACHE=/tmp/xla_seed_harvest \
  AUDIOGAN_XLA_SEED=0 python bench.py --preset all \
  2>&1 | tee bench/r5_close_bench_log.txt || echo "CLOSE_BENCH FAIL"
for i in 1 2 3 4 5; do
  git add bench/r5_close_bench_log.txt && \
  git commit -m "r5 close bench: all presets, interleaved-median headline" \
  && break
  sleep 7
done

echo "===== (8) harvest XLA cache seeds (fresh-VM cold-start) ====="
# Snapshot the preset graphs compiled by stage 7 into
# bench/xla_cache_seed/ so the next VM skips the 10-15 min cold step
# compiles (docs/OPERATIONS.md). Entries are already high-entropy
# (~incompressible); keeping only stage 7's dir excludes the one-off A/B
# variant graphs from the repo.
timeout 1200 python scripts/harvest_xla_seed.py \
  --cache_dir /tmp/xla_seed_harvest --commit || echo "HARVEST FAIL"

echo "===== (9) post-fdv device profiles (the shipped operating point) ====="
timeout 3600 python scripts/profile_step.py --preset wgan_gp_b64 --steps 3 \
  2>&1 | tee bench/r5_profile_flagship_fdv.txt || echo "PROFILE_FDV FAIL"
timeout 3600 python scripts/profile_step.py --preset music_44k_dp16 \
  --set mesh.dp=1 --steps 3 \
  2>&1 | tee bench/r5_profile_music_fdv.txt || echo "PROFILE_MUSIC_FDV FAIL"
for i in 1 2 3 4 5; do
  git add bench/r5_profile_flagship_fdv.txt bench/r5_profile_music_fdv.txt && \
  git commit -m "r5: post-fused_d_views device profiles (flagship + music)" \
  && break
  sleep 7
done

echo "===== r5 tail done — chip free ====="
