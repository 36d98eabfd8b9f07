#!/bin/bash
# Round-2: LEAKAGE-FREE retraining of all seven model-zoo names on the
# clean corpus (scripts/clean_corpus — 67 images fully disjoint from
# testsets/set and set1; see train/corpus.py). Outputs go to /tmp/zoo_clean
# as <name>_clean.npz; evaluate + promote to model_zoo/ after sweeps.
# Uses --scan_steps 200 (lax.scan megasteps) — the axon tunnel's per-step
# dispatch latency otherwise dominates (measured 5 steps/s -> compute-bound).
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
mkdir -p /tmp/zoo_clean
CORPUS=scripts/clean_corpus
COMMON="--ondevice --scan_steps 200 --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 --trainset $CORPUS"

# 1. dncnn_25 first: fastest family, early signal on clean-corpus quality
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model dncnn --sigma 25 --steps 60000 --batch 32 \
    --out /tmp/zoo_clean/dncnn_25_clean.npz
echo DONE_dncnn_25

# 2. drunet (flagship)
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model drunet --sigma 0 --sigma_max 50 --steps 120000 --batch 16 \
    --patch 64 \
    --out /tmp/zoo_clean/drunet_gray_clean.npz
echo DONE_drunet

# 3-4. conditioned mid-size families
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model ffdnet --sigma 5 --sigma_max 50 --steps 80000 --batch 32 \
    --out /tmp/zoo_clean/ffdnet_gray_clean.npz
echo DONE_ffdnet
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model fdncnn --sigma 5 --sigma_max 50 --steps 80000 --batch 32 \
    --out /tmp/zoo_clean/fdncnn_gray_clean.npz
echo DONE_fdncnn

# 5-6. remaining dncnn noise levels
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model dncnn --sigma 15 --steps 60000 --batch 32 \
    --out /tmp/zoo_clean/dncnn_15_clean.npz
echo DONE_dncnn_15
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model dncnn --sigma 50 --steps 60000 --batch 32 \
    --out /tmp/zoo_clean/dncnn_50_clean.npz
echo DONE_dncnn_50

# 7. ircnn 25-bin bundle (warm-started walk)
T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser $COMMON \
    --model ircnn --bundle --steps 60000 --bundle_steps 12000 --batch 32 \
    --out /tmp/zoo_clean/ircnn_gray_clean.npz
echo DONE_ircnn
echo DONE_ALL_CLEAN
