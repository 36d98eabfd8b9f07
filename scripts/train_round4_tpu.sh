#!/bin/bash
# Round-4 quality headroom: retrain the models still below their reference
# band (ircnn bundle, dncnn_25) with larger step counts, plus longer
# fdncnn/ffdnet runs. Sequential — the axon chip is single-process.
# Outputs to /tmp/zoo4; evaluate + rho-sweep before promoting to model_zoo/.
set -x
cd /root/repo
T() { timeout 14000 "$@"; }

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ircnn --bundle --steps 20000 --bundle_steps 6000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 \
    --out /tmp/zoo4/ircnn_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 25 --steps 100000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 \
    --out /tmp/zoo4/dncnn_25.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model fdncnn --sigma 5 --sigma_max 50 --steps 80000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 \
    --out /tmp/zoo4/fdncnn_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ffdnet --sigma 5 --sigma_max 50 --steps 80000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 \
    --out /tmp/zoo4/ffdnet_gray.npz
echo DONE_ROUND4
