#!/bin/bash
# Round-6: full extra corpus (reference BM3D examples + sklearn/matplotlib
# offline samples incl. two MRI slices, scripts/extra_corpus/) + EMA for the
# remaining models. Round-5 showed extras+EMA lift dncnn_50 (+0.3 dB) and
# dncnn_15 (+0.4 dB at the tuned short-iteration schedule); this applies the
# same recipe to ffdnet/fdncnn/drunet and retries dncnn_25.
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
EXTRA="/root/reference/bm3d307/examples/cameraman256.png,/root/reference/bm3d307/examples/image_Lena512rgb.png,/root/reference/bm3d307/examples/brainslice.mat,/root/repo/scripts/extra_corpus/china.png,/root/repo/scripts/extra_corpus/flower.png,/root/repo/scripts/extra_corpus/grace_hopper.png,/root/repo/scripts/extra_corpus/s1045_mri.png"
mkdir -p /tmp/zoo6

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ffdnet --sigma 5 --sigma_max 50 --steps 80000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo6/ffdnet_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model fdncnn --sigma 5 --sigma_max 50 --steps 80000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo6/fdncnn_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
    --patch 64 --multiscale --lr_decay cosine --ckpt_every 2000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo6/drunet_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 25 --steps 100000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo6/dncnn_25.npz
echo DONE_ROUND6
