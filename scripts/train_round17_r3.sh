#!/bin/bash
# Round-3 campaign, part 3: spread the self-distillation win across the
# clean families. Teacher = the promoted round-3 drunet_gray_clean.npz;
# students warm-start from their r2 clean weights and train on the
# infinite on-device synth stream (leakage-free by construction).
#  1. ffdnet_distill  — cross-arch distillation (strong teacher)
#  2. fdncnn_distill  — cross-arch distillation
#  3. drunet_distill2 — second self-distillation iteration (lower lr)
# Waits for the standalone tdnet_v2 job to release the TPU first.
set -x
cd /root/repo
TEACHER=model_zoo/drunet_gray_clean.npz
COMMON="--lr_decay cosine --ema 0.999 --scan_steps 200 --ckpt_every 10000 \
  --synth_size 128 --patch 64 --synth 4096 --synth_refresh 2000 \
  --sigma 0 --sigma_max 50"

until grep -q '"out"' zoo_r3/tdnet_v2.log 2>/dev/null; do
  echo "waiting for tdnet_v2 to finish $(date)"; sleep 120
done

wait_tpu() {
  until timeout 90 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.ones((2,2)).sum()))" \
    >/dev/null 2>&1; do
    echo "tunnel down $(date), sleeping 180s"
    sleep 180
  done
  echo "tunnel up $(date)"
}

run_job() {  # run_job <out> <job args...>
  local out=$1; shift
  if [ -f "$out.done" ]; then echo "SKIP existing $out"; return 0; fi
  for attempt in 1 2; do
    wait_tpu
    if timeout 7200 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
        $COMMON "$@" --out "$out"; then
      touch "$out.done"; echo "DONE $out"; return 0
    fi
    echo "RETRY $out (attempt $attempt failed)"
  done
  echo "FAILED $out"; return 1
}

run_job zoo_r3/ffdnet_distill.npz \
  --model ffdnet --steps 60000 --batch 32 --lr 5e-5 \
  --resume model_zoo/ffdnet_gray_clean.npz \
  --distill $TEACHER --distill_weight 0.7
run_job zoo_r3/fdncnn_distill.npz \
  --model fdncnn --steps 60000 --batch 32 --lr 5e-5 \
  --resume model_zoo/fdncnn_gray_clean.npz \
  --distill $TEACHER --distill_weight 0.7
run_job zoo_r3/drunet_distill2.npz \
  --model drunet --steps 60000 --batch 16 --lr 3e-5 \
  --resume $TEACHER --distill $TEACHER --distill_weight 0.5
echo DONE_ALL_R17
