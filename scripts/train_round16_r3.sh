#!/bin/bash
# Round-3 campaign, part 2 (after the stream60k scaling point):
#  1. tdnet_distill — the MXU-shaped nc=128 student (VERDICT r2 #4)
#     distilled from the clean DRUNet teacher on the infinite synth
#     stream (distill_weight 0.7 blends teacher + clean supervision).
#  2. drunet_distill — quality push for the flagship prior: fresh DRUNet
#     warm-started from the incumbent clean weights, self-distilled
#     against them on the infinite stream at low LR (knowledge kept,
#     data unlimited; leakage-free by construction — the teacher never
#     saw a test image).
# Tunnel-hardened like round15b: wait for axon health, bounded jobs,
# one retry, skip completed outputs.
set -x
cd /root/repo
mkdir -p zoo_r3
COMMON="--lr_decay cosine --ema 0.999 --scan_steps 200 --ckpt_every 10000 \
  --synth_size 128 --patch 64 --synth 4096 --synth_refresh 2000"

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
    if timeout 9000 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
        $COMMON "$@" --out "$out"; then
      touch "$out.done"; echo "DONE $out"; return 0
    fi
    echo "RETRY $out (attempt $attempt failed)"
  done
  echo "FAILED $out"; return 1
}

run_job zoo_r3/tdnet_distill.npz \
  --model tdnet --sigma 0 --sigma_max 50 --steps 120000 --batch 32 \
  --distill model_zoo/drunet_gray_clean.npz --distill_weight 0.7
run_job zoo_r3/drunet_distill.npz \
  --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
  --lr 5e-5 --resume model_zoo/drunet_gray_clean.npz \
  --distill model_zoo/drunet_gray_clean.npz --distill_weight 0.5
echo DONE_ALL_R16
