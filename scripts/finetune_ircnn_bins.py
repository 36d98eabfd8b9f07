"""Targeted IRCNN bin fine-tune.

The tuned 5-iteration PnP ladder (docs/USAGE.md) touches only bins
{24, 11, 5, 2, 1} of the 25-bin bundle (sigma ladder 49->2.55,
``ircnn_sigma_indices``); the bundle walk gave each bin a short
warm-started fine-tune. This script gives exactly those bins a long
dedicated run (EMA-averaged), warm-started from the current bundle, and
writes the result back into the stacked (25, ...) layout.

    python scripts/finetune_ircnn_bins.py [--steps 25000] \
        [--bundle model_zoo/ircnn_gray.npz] [--out /tmp/zoo8/ircnn_gray.npz]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bundle", default="/root/repo/model_zoo/ircnn_gray.npz")
    p.add_argument("--out", default="/tmp/zoo8/ircnn_gray.npz")
    p.add_argument("--steps", type=int, default=25000)
    p.add_argument("--bins", default="1,2,5,11,24")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pnp_admm_cnc_mri_tpu.data import images
    from pnp_admm_cnc_mri_tpu.models import convert
    from pnp_admm_cnc_mri_tpu.models.dncnn import IRCNN
    from pnp_admm_cnc_mri_tpu.train import data as data_mod, trainer

    stacked = convert.load_npz(args.bundle)
    imgs01, _, _ = images.load_testset(images.DEFAULT_TESTSETS + "/set")
    patches = data_mod.extract_patches_multiscale(list(imgs01))
    model = IRCNN(out_nc=1, nc=64)
    cfg = trainer.TrainConfig(lr_decay="cosine")

    for b in [int(x) for x in args.bins.split(",")]:
        params_b = jax.tree.map(lambda a: np.asarray(a)[b], stacked)
        sigma = (2 * b + 1) / 255.0
        new_p, losses = trainer.train_denoiser_ondevice(
            model, patches, sigma, steps=args.steps, batch_size=args.batch,
            cfg=cfg, params=params_b, seed=100 + b, ema_decay=0.999,
        )
        new_p = jax.device_get(new_p)
        stacked = jax.tree.map(
            lambda s, n: np.concatenate(
                [np.asarray(s)[:b], np.asarray(n)[None], np.asarray(s)[b + 1:]]),
            stacked, new_p)
        print(json.dumps({"bin": b, "loss": losses[-1]}), flush=True)

    convert.save_npz(stacked, args.out)
    print(json.dumps({"out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
