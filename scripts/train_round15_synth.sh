#!/bin/bash
# Round-3: prior quality push on the ON-DEVICE procedural corpus
# (train/synth.py, VERDICT r2 #2 + #4).
#
# Part A — corpus-size scaling study, FIXED recipe (drunet from scratch,
#   60k steps, cosine, EMA, patch 64): buffers of 128 / 1024 / 8192
#   images frozen at step 0. >=3 points of PSNR-vs-corpus-size.
# Part B — flagship: drunet on the effectively infinite stream
#   (4096-image buffer regenerated every 2000 steps), 150k steps.
# Part C — TDNet (MXU-shaped nc=128 prior) on the same stream.
#
# Each run evaluates afterwards with scripts/sweep_clean.py (pnp_fista_d).
set -x
cd /root/repo
T() { timeout 13000 "$@"; }
mkdir -p /tmp/zoo_r3
COMMON="--lr_decay cosine --ema 0.999 --scan_steps 200 --ckpt_every 10000 \
  --synth_size 128 --patch 64"

# Part A: scaling points
for N in 128 1024 8192; do
  T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
      --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
      --synth $N --synth_refresh 0 \
      --out /tmp/zoo_r3/drunet_synth${N}.npz
  echo DONE_drunet_synth${N}
done

# Part B: infinite stream, longer schedule
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model drunet --sigma 0 --sigma_max 50 --steps 150000 --batch 16 \
    --synth 4096 --synth_refresh 2000 \
    --out /tmp/zoo_r3/drunet_stream.npz
echo DONE_drunet_stream

# Part C: TDNet on the stream
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model tdnet --nc 128 --sigma 0 --sigma_max 50 --steps 120000 \
    --batch 32 --synth 4096 --synth_refresh 2000 \
    --out /tmp/zoo_r3/tdnet_stream.npz
echo DONE_tdnet_stream
echo DONE_ALL_R15
