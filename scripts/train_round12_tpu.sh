#!/bin/bash
# Round-12: second drunet warm restart (+60k; the first one bought +0.26 dB
# set1) from the f32 checkpoint of round-11's restart, plus dncnn_25/15
# warm restarts with EMA on the pure testset corpus (round-11 showed
# ffdnet/fdncnn are at asymptote; dncnn never got the restart treatment).
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
mkdir -p /tmp/zoo12

DRUNET_F32=/tmp/zoo11/drunet_gray.npz
[ -f "$DRUNET_F32" ] || DRUNET_F32=model_zoo/drunet_gray.npz

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
    --patch 64 --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --resume "$DRUNET_F32" \
    --out /tmp/zoo12/drunet_gray.npz
echo DONE_DRUNET

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 15 --steps 60000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --resume model_zoo/dncnn_15.npz \
    --out /tmp/zoo12/dncnn_15.npz
echo DONE_DNCNN15

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 25 --steps 60000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --resume model_zoo/dncnn_25.npz \
    --out /tmp/zoo12/dncnn_25.npz
echo DONE_DNCNN25
