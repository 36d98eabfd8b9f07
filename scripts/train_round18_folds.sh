#!/bin/bash
# Round-4 k-fold fold-exclusion campaign (VERDICT r3 #1): fine-tune the
# incumbent clean drunet per fold on a MIXED corpus (scripts/clean_corpus
# + the 12 non-fold real test images x4), so each test image is evaluated
# by a model that never saw it. Fold 2 ({04,05,06}) ran as the pilot
# (zoo_r4/drunet_fold2_mixed.npz, set1 31.653 vs incumbent 31.55; recipe
# selection: pure-real 31.44 / warp-enriched 31.615 / mixed 31.653).
#
# Retry policy (round-3 ADVICE): on retry, resume from the newest
# checkpoint the failed attempt wrote (--ckpt_every writes to $out), and
# escalate the timeout on the second attempt.
set -x
cd /root/repo
mkdir -p zoo_r4
SET=/root/reference/testsets/set
COMMON="--model drunet --ondevice --scan_steps 200 --multiscale \
  --lr_decay cosine --ema 0.999 --ckpt_every 4000 \
  --trainset scripts/clean_corpus \
  --sigma 0 --sigma_max 50 --patch 64 --batch 16 --lr 5e-5 --steps 20000"

wait_tpu() {
  until timeout 90 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.ones((2,2)).sum()))" \
    >/dev/null 2>&1; do
    echo "tunnel down $(date), sleeping 120s"; sleep 120
  done
}

run_fold() {  # run_fold <foldname> <excluded ids...>
  local name=$1; shift
  local out=zoo_r4/drunet_${name}_mixed.npz
  if [ -f "$out.done" ]; then echo "SKIP $out"; return 0; fi
  # extra images: every test image NOT excluded, repeated 4x
  local ex=""
  for i in 01 02 03 04 05 06 07 08 09 10 11 12 13 14 15; do
    case " $* " in (*" $i "*) continue;; esac
    for r in 1 2 3 4; do ex="$ex,$SET/$i.png"; done
  done
  ex=${ex#,}
  local tmo=3600 resume=model_zoo/drunet_gray_clean.npz
  for attempt in 1 2 3; do
    wait_tpu
    # resume from the newest checkpoint if a failed attempt left one
    if [ -f "$out" ]; then resume=$out; fi
    if timeout "$tmo" python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
        $COMMON --extra_images "$ex" --resume "$resume" --out "$out" \
        > "zoo_r4/train_${name}.log" 2>&1; then
      touch "$out.done"; echo "DONE $out"; return 0
    fi
    echo "RETRY $out (attempt $attempt failed)"; tmo=$((tmo + 3600))
  done
  echo "FAILED $out"; return 1
}

run_fold fold1 01 02 03
run_fold fold3 07 08 09
run_fold fold4 10 11 12
run_fold fold5 13 14 15
echo DONE_ALL_FOLDS
