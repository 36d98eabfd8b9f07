#!/bin/bash
# Round-9: ircnn bundle quality push (the one cell still below the
# reference's set1 last-run: 29.64 vs 30.00). Bigger center-bin run +
# longer warm-started walk, EMA, full extra corpus.
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
EXTRA="/root/reference/bm3d307/examples/cameraman256.png,/root/reference/bm3d307/examples/image_Lena512rgb.png,/root/reference/bm3d307/examples/brainslice.mat,/root/repo/scripts/extra_corpus/china.png,/root/repo/scripts/extra_corpus/flower.png,/root/repo/scripts/extra_corpus/grace_hopper.png,/root/repo/scripts/extra_corpus/s1045_mri.png"
mkdir -p /tmp/zoo9

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ircnn --bundle --steps 60000 --bundle_steps 15000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --extra_images "$EXTRA" \
    --out /tmp/zoo9/ircnn_gray.npz
echo DONE_ROUND7
