#!/bin/bash
# Round-14: fourth drunet warm restart (+60k). Set1 L1 gains per restart:
# +0.26, +0.20, +0.16 (now 32.38 L1 / 32.53 CNC set1 at the tuned
# settings); keep walking until it flattens.
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
mkdir -p /tmp/zoo14

DRUNET_F32=/tmp/zoo13/drunet_gray.npz
[ -f "$DRUNET_F32" ] || DRUNET_F32=model_zoo/drunet_gray.npz

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
    --patch 64 --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --resume "$DRUNET_F32" \
    --out /tmp/zoo14/drunet_gray.npz
echo DONE_DRUNET14
