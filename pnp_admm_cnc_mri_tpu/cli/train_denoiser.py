"""CLI: train a denoiser prior on TPU and save npz weights.

    python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
        --model dncnn --sigma 15 --steps 2000 --out model_zoo/dncnn_15.npz

The saved npz loads directly into the PnP pipelines via
``--weights model_zoo/dncnn_15.npz`` (new capability; the reference
depends on external KAIR checkpoints, ``model_zoo/README.md``).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="dncnn",
                   choices=["dncnn", "fdncnn", "ircnn", "ffdnet", "drunet"])
    p.add_argument("--sigma", type=float, default=15.0, help="noise level /255")
    p.add_argument("--sigma_max", type=float, default=None,
                   help="if set, sample sigma in [--sigma, --sigma_max]")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--patch", type=int, default=40)
    p.add_argument("--multiscale", action="store_true",
                   help="extract patches at scales (1.0, 0.75, 0.5)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--trainset", default=None, help="dir of training images")
    p.add_argument("--exclude", default=None,
                   help="comma list of image basenames to EXCLUDE from training "
                        "(leakage-free evaluation, e.g. --exclude 05)")
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--nc", type=int, default=64)
    p.add_argument("--nb", type=int, default=None)
    p.add_argument("--mesh", action="store_true", help="shard over all devices")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pnp_admm_cnc_mri_tpu.data import images
    from pnp_admm_cnc_mri_tpu.models import convert
    from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN, FDnCNN, IRCNN
    from pnp_admm_cnc_mri_tpu.models.drunet import UNetRes
    from pnp_admm_cnc_mri_tpu.models.ffdnet import FFDNet
    from pnp_admm_cnc_mri_tpu.train import data as data_mod, trainer

    trainset = args.trainset or os.path.join(images.DEFAULT_TESTSETS, "set")
    imgs01, _, names = images.load_testset(trainset)
    if args.exclude:
        skip = set(args.exclude.split(","))
        keep = [i for i, n in enumerate(names) if n not in skip]
        imgs01 = imgs01[keep]
    if args.multiscale:
        patches = data_mod.extract_patches_multiscale(list(imgs01), patch=args.patch)
    else:
        patches = data_mod.extract_patches(list(imgs01), patch=args.patch)

    conditioned = False
    ffdnet_style = False
    if args.model == "dncnn":
        model = DnCNN(out_nc=1, nc=args.nc, nb=args.nb or 17)
    elif args.model == "ircnn":
        model = IRCNN(out_nc=1, nc=args.nc)
    elif args.model == "fdncnn":
        model = FDnCNN(out_nc=1, nc=args.nc, nb=args.nb or 20)
        conditioned = True
    elif args.model == "ffdnet":
        model = FFDNet(out_nc=1, nc=args.nc, nb=args.nb or 15)
        ffdnet_style = True
    else:
        model = UNetRes(out_nc=1, nc=(64, 128, 256, 512), nb=args.nb or 4)
        conditioned = True

    sigma = args.sigma / 255.0
    if args.sigma_max is not None:
        sigma = (sigma, args.sigma_max / 255.0)

    mesh = None
    if args.mesh:
        from pnp_admm_cnc_mri_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh()

    cfg = trainer.TrainConfig(
        learning_rate=args.lr, loss="l1" if args.model == "fdncnn" else "l2"
    )
    params, losses = trainer.train_denoiser(
        model, patches, sigma, steps=args.steps, batch_size=args.batch,
        cfg=cfg, mesh=mesh, conditioned=conditioned, ffdnet_style=ffdnet_style,
    )
    params = jax.tree.map(np.asarray, params)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    convert.save_npz(params, args.out)
    print(json.dumps({"out": args.out, "losses": losses[-3:], "patches": len(patches)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
