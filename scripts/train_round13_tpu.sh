#!/bin/bash
# Round-13: third drunet warm restart (+60k). Restart #1 bought +0.26 dB
# set1, #2 another +0.20 (32.22 L1 / 32.42 CNC set1 at the tuned
# settings); keep walking until it flattens.
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
mkdir -p /tmp/zoo13

DRUNET_F32=/tmp/zoo12/drunet_gray.npz
[ -f "$DRUNET_F32" ] || DRUNET_F32=model_zoo/drunet_gray.npz

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
    --patch 64 --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --resume "$DRUNET_F32" \
    --out /tmp/zoo13/drunet_gray.npz
echo DONE_DRUNET13
