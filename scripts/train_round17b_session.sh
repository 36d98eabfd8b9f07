#!/bin/bash
# Round-3 (this session): run the round-17 cross-distillation jobs that
# fit the session budget — ffdnet + fdncnn students distilled from the
# promoted self-distilled drunet teacher on the infinite on-device synth
# stream (leakage-free by construction). drunet_distill2 is deferred to
# a later slot if time remains. Same recipe as train_round17_r3.sh.
set -x
cd /root/repo
mkdir -p zoo_r3
TEACHER=model_zoo/drunet_gray_clean.npz
COMMON="--lr_decay cosine --ema 0.999 --scan_steps 200 --ckpt_every 10000 \
  --synth_size 128 --patch 64 --synth 4096 --synth_refresh 2000 \
  --sigma 0 --sigma_max 50"

wait_tpu() {
  until timeout 90 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.ones((2,2)).sum()))" \
    >/dev/null 2>&1; do
    echo "tunnel down $(date), sleeping 60s"
    sleep 60
  done
  echo "tunnel up $(date)"
}

run_job() {  # run_job <out> <timeout_s> <job args...>
  local out=$1 tmo=$2; shift 2
  if [ -f "$out.done" ]; then echo "SKIP existing $out"; return 0; fi
  for attempt in 1 2; do
    wait_tpu
    if timeout "$tmo" python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
        $COMMON "$@" --out "$out"; then
      touch "$out.done"; echo "DONE $out"; return 0
    fi
    echo "RETRY $out (attempt $attempt failed)"
  done
  echo "FAILED $out"; return 1
}

run_job zoo_r3/ffdnet_distill.npz 1500 \
  --model ffdnet --steps 60000 --batch 32 --lr 5e-5 \
  --resume model_zoo/ffdnet_gray_clean.npz \
  --distill $TEACHER --distill_weight 0.7
run_job zoo_r3/fdncnn_distill.npz 1500 \
  --model fdncnn --steps 60000 --batch 32 --lr 5e-5 \
  --resume model_zoo/fdncnn_gray_clean.npz \
  --distill $TEACHER --distill_weight 0.7
echo DONE_R17B
