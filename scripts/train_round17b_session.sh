#!/bin/bash
# Round-3 (this session): run the round-17 cross-distillation jobs that
# fit the session budget — ffdnet + fdncnn students distilled from the
# promoted self-distilled drunet teacher on the infinite on-device synth
# stream (leakage-free by construction). drunet_distill2 ran in a later
# slot of the same session — its exact invocation is the run_job at the
# bottom (30k steps, lr 3e-5, distill_weight 0.5 — NOT the 60k variant
# sketched in train_round17_r3.sh), recorded here so the published
# eval rows (results/r17_distill_eval.jsonl: 31.462 set1 / 32.691 set,
# below the 31.55/32.77 incumbent -> not promoted) are reproducible.
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

run_job() {  # run_job <out> <timeout_s> <resume> <job args...>
  local out=$1 tmo=$2 resume=$3; shift 3
  if [ -f "$out.done" ]; then echo "SKIP existing $out"; return 0; fi
  for attempt in 1 2; do
    wait_tpu
    # round-3 ADVICE: resume from the newest --ckpt_every checkpoint if a
    # failed attempt left one, and escalate the timeout on retry
    if [ -f "$out" ]; then resume=$out; fi
    if timeout "$tmo" python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
        $COMMON "$@" --resume "$resume" --out "$out"; then
      touch "$out.done"; echo "DONE $out"; return 0
    fi
    echo "RETRY $out (attempt $attempt failed)"; tmo=$((tmo * 2))
  done
  echo "FAILED $out"; return 1
}

run_job zoo_r3/ffdnet_distill.npz 1500 model_zoo/ffdnet_gray_clean.npz \
  --model ffdnet --steps 60000 --batch 32 --lr 5e-5 \
  --distill $TEACHER --distill_weight 0.7
run_job zoo_r3/fdncnn_distill.npz 1500 model_zoo/fdncnn_gray_clean.npz \
  --model fdncnn --steps 60000 --batch 32 --lr 5e-5 \
  --distill $TEACHER --distill_weight 0.7
# second self-distillation iteration (the invocation that actually ran;
# evaluated below the incumbent and not promoted)
run_job zoo_r3/drunet_distill2.npz 2400 $TEACHER \
  --model drunet --steps 30000 --batch 16 --lr 3e-5 \
  --distill $TEACHER --distill_weight 0.5
echo DONE_R17B
