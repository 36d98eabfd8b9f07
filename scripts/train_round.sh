#!/bin/bash
# Sequential background training for round-1 weight gaps (CPU; the axon
# TPU tunnel is too unstable for multi-hour runs). Checkpoints every 500
# steps so partial progress always loads.
set -x
cd /root/repo
nice -n 19 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --cpu \
    --model ffdnet --sigma 5 --sigma_max 50 --steps 12000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 500 \
    --out model_zoo/ffdnet_gray.npz
nice -n 19 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --cpu \
    --model ircnn --bundle --steps 3000 --bundle_steps 700 --batch 32 \
    --multiscale --lr_decay cosine \
    --out model_zoo/ircnn_gray.npz
nice -n 19 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --cpu \
    --model fdncnn --sigma 5 --sigma_max 50 --steps 12000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 500 \
    --out model_zoo/fdncnn_gray.npz
echo DONE_ALL
