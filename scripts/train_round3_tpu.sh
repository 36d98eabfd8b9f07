#!/bin/bash
# Round 3: retrain the full denoiser zoo ON the TPU chip via the fused
# on-device loop (scripts/train_round2.sh took ~10 h/model on 4 CPU cores;
# the chip does ~30 steps/s on DRUNet and much more on the small nets).
# Runs sequentially — the axon chip is single-process. Outputs to /tmp;
# evaluate + rho-sweep before promoting into model_zoo/.
set -x
cd /root/repo

T() { timeout 14000 "$@"; }

# DRUNet first — the one model family with NO shipped weights (round-2 CPU
# training never finished). Blind sigma in [0,50] with a sigma-map channel,
# matching the reference checkpoint's training regime (KAIR drunet_gray).
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model drunet --sigma 0 --sigma_max 50 --steps 30000 --batch 16 \
    --patch 64 --multiscale --lr_decay cosine --ckpt_every 500 \
    --out /tmp/zoo/drunet_gray.npz
# dncnn_50: in the reference's model list but we never shipped weights.
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 50 --steps 50000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 \
    --out /tmp/zoo/dncnn_50.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model fdncnn --sigma 5 --sigma_max 50 --steps 40000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 \
    --out /tmp/zoo/fdncnn_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ffdnet --sigma 5 --sigma_max 50 --steps 40000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 \
    --out /tmp/zoo/ffdnet_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ircnn --bundle --steps 8000 --bundle_steps 2500 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 \
    --out /tmp/zoo/ircnn_gray.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 15 --steps 50000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 \
    --out /tmp/zoo/dncnn_15.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 15 --steps 50000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 --exclude 05 \
    --out /tmp/zoo/dncnn_15_no05.npz
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model dncnn --sigma 25 --steps 50000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 2000 \
    --out /tmp/zoo/dncnn_25.npz
echo DONE_ROUND3
