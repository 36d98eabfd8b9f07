#!/bin/bash
# Round-2 continuation: drunet clean-corpus expansion experiment.
# Warm-restart the leakage-free drunet from model_zoo/drunet_gray_clean.npz
# on the EXPANDED clean corpus (scripts/clean_corpus_v2 — v1's 67 images
# + 32 1/f Gaussian fields + 32 MRI-like ellipse phantoms + 16 extra
# dead leaves + 16 extra warps; generators in train/corpus.py).
# Evaluate via PnP-FISTA (pnp_fista_d --clean --tuned) and promote to
# model_zoo/drunet_gray_clean.npz ONLY if it beats the incumbent 31.50
# set1 / 32.66 full set.
set -x
cd /root/repo
mkdir -p /tmp/zoo_clean
timeout 7000 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
    --ondevice --scan_steps 200 --multiscale --lr_decay cosine --ema 0.999 \
    --trainset scripts/clean_corpus_v2 \
    --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
    --patch 64 --lr 5e-5 \
    --resume model_zoo/drunet_gray_clean.npz \
    --out /tmp/zoo_clean/drunet_gray_clean_v2.npz
