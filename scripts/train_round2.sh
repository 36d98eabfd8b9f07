#!/bin/bash
# Round 2: retrain the DnCNN family with cosine decay + longer schedules,
# then DRUNet (checkpointed every 200 steps; partial weights always load).
set -x
cd /root/repo
nice -n 19 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --cpu \
    --model dncnn --sigma 15 --steps 20000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 1000 --exclude 05 \
    --out model_zoo/dncnn_15_no05.npz
nice -n 19 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --cpu \
    --model dncnn --sigma 15 --steps 20000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 1000 \
    --out model_zoo/dncnn_15.npz
nice -n 19 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --cpu \
    --model dncnn --sigma 25 --steps 20000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 1000 \
    --out model_zoo/dncnn_25.npz
nice -n 19 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --cpu \
    --model drunet --sigma 5 --sigma_max 50 --steps 8000 --batch 8 \
    --patch 48 --multiscale --lr_decay cosine --ckpt_every 200 \
    --out model_zoo/drunet_gray.npz
echo DONE_ROUND2
