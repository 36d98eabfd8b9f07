#!/bin/bash
# Round-5 quality push for the two models still below their reference band
# (dncnn_25 28.76 vs 29.67; dncnn_50 25.46 vs 26.36-26.75), plus refreshes
# of dncnn_15 and the ircnn bundle. New levers vs round 4: EMA weight
# averaging (--ema 0.999) and a larger patch corpus (--extra_images pulls in
# cameraman256, Lena512 gray, and the brainslice MRI sample from the
# reference's BM3D examples — 2.5x more patches).
# Sequential — the axon chip is single-process. Outputs to /tmp/zoo5;
# evaluate + rho-sweep before promoting to model_zoo/.
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
EXTRA="/root/reference/bm3d307/examples/cameraman256.png,/root/reference/bm3d307/examples/image_Lena512rgb.png,/root/reference/bm3d307/examples/brainslice.mat"
mkdir -p /tmp/zoo5

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 25 --steps 120000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo5/dncnn_25.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 50 --steps 100000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo5/dncnn_50.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 15 --steps 60000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo5/dncnn_15.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ircnn --bundle --steps 20000 --bundle_steps 6000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo5/ircnn_gray.npz
echo DONE_ROUND5
