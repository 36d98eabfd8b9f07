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
                   choices=["dncnn", "fdncnn", "ircnn", "ffdnet", "drunet",
                            "tdnet"])
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
    p.add_argument("--lr_decay", choices=["cosine"], default=None,
                   help="anneal the learning rate over the run")
    p.add_argument("--ckpt_every", type=int, default=0,
                   help="save the npz every N steps (long runs survive kill)")
    p.add_argument("--bundle", action="store_true",
                   help="ircnn only: train all 25 noise-bin models "
                        "(sigma255 = 1,3,...,49), warm-starting each bin from "
                        "its neighbor, and save one stacked npz compatible "
                        "with the ircnn_gray PnP adapter")
    p.add_argument("--bundle_steps", type=int, default=800,
                   help="fine-tune steps per non-center bin (--bundle)")
    p.add_argument("--scan_steps", type=int, default=1,
                   help="ondevice only: optimizer steps per dispatch via "
                        "lax.scan (amortizes the axon tunnel's ~150 ms "
                        "round-trip; 100-200 is compute-bound)")
    p.add_argument("--ondevice", action="store_true",
                   help="stage the patch corpus to the device once and fuse "
                        "sampling+augment+noise+update in one jit per step — "
                        "required for training over the axon TPU link "
                        "(per-step host batches stall); also the fastest "
                        "local path")
    p.add_argument("--resume", default=None,
                   help="npz checkpoint to warm-start from")
    p.add_argument("--ema", type=float, default=None,
                   help="EMA decay for weight averaging (e.g. 0.999); the "
                        "averaged weights are what gets saved (ondevice only)")
    p.add_argument("--extra_images", default=None,
                   help="comma list of extra grayscale image files to add to "
                        "the patch corpus (PNGs; .mat loads var 'image')")
    p.add_argument("--synth", type=int, default=0,
                   help="train on an ON-DEVICE procedural corpus of this "
                        "many images (train/synth.py: dead leaves + 1/f "
                        "fields + MRI phantoms + elastic warps; leakage-"
                        "immune, zero host transfers). Replaces --trainset.")
    p.add_argument("--synth_size", type=int, default=128,
                   help="generated image side (--synth)")
    p.add_argument("--synth_refresh", type=int, default=0,
                   help="regenerate the on-device corpus every N steps "
                        "(0 = fixed corpus — the scaling-study knob; "
                        ">0 = effectively infinite stream)")
    p.add_argument("--synth_disks", type=int, default=600,
                   help="dead-leaves disk count per image (--synth)")
    p.add_argument("--distill", default=None,
                   help="npz of a DRUNet (UNetRes) teacher: the student "
                        "regresses the teacher's output on the same noisy "
                        "batch (synth stream only) — an MXU-shaped student "
                        "inherits the teacher's prior on unlimited data")
    p.add_argument("--distill_weight", type=float, default=0.7,
                   help="loss blend: w*MSE(student,teacher) + "
                        "(1-w)*MSE(student,clean)")
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

    if args.synth:
        patches = None  # stream trainer synthesizes on device
    else:
        trainset = args.trainset or os.path.join(images.DEFAULT_TESTSETS, "set")
        imgs01, names = images.load_images_dir(trainset)
        if args.exclude:
            skip = set(args.exclude.split(","))
            imgs01 = [im for im, n in zip(imgs01, names) if n not in skip]
        corpus_imgs = list(imgs01)
        if args.extra_images:
            for path in args.extra_images.split(","):
                path = path.strip()
                if path.endswith(".mat"):
                    import scipy.io as sio
                    arrs = {k: v for k, v in sio.loadmat(path).items()
                            if not k.startswith("__")}
                    arr = np.abs(np.asarray(next(iter(arrs.values())),
                                            np.float64))
                    if arr.ndim == 3:
                        arr = arr.mean(axis=-1)
                    arr = arr / max(float(arr.max()), 1e-12)
                else:
                    arr = images.uint2single(images.imread_gray(path))
                corpus_imgs.append(np.asarray(arr, np.float32))
        if args.multiscale:
            patches = data_mod.extract_patches_multiscale(corpus_imgs,
                                                          patch=args.patch)
        else:
            patches = data_mod.extract_patches(corpus_imgs, patch=args.patch)

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
    elif args.model == "tdnet":
        from pnp_admm_cnc_mri_tpu.models.tdnet import TDNet

        model = TDNet(out_nc=1, nc=args.nc if args.nc != 64 else 128,
                      nb=args.nb or 12)
        ffdnet_style = True  # same (x, sigma) apply signature
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
        learning_rate=args.lr, loss="l1" if args.model == "fdncnn" else "l2",
        lr_decay=args.lr_decay,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    def save(tree, path):
        convert.save_npz(jax.tree.map(np.asarray, tree), path)

    ckpt_cb = None
    if args.ckpt_every:
        def ckpt_cb(step, p, _path=args.out):
            save(p, _path)
            print(json.dumps({"ckpt": _path, "step": step}), flush=True)

    if args.bundle:
        if args.model != "ircnn":
            raise SystemExit("--bundle is only meaningful for --model ircnn")
        if args.synth:
            raise SystemExit("--bundle does not support --synth yet")
        # The reference's ircnn_gray checkpoint is 25 state-dicts keyed
        # "0".."24" by noise bin (【3】PNP_ADMM_L1_D  .py:188-189, :281-288);
        # bin i serves sigma255 in (2i, 2i+2], center 2i+1. Train the middle
        # bin fully, then walk outward warm-starting from the neighbor —
        # adjacent noise levels share most of the mapping, so each bin only
        # needs a short fine-tune.
        center = 12
        bins: dict[int, object] = {}

        def run_train(sig, steps, params=None, seed=0, ckpt_cb=None,
                      ckpt_every=0):
            if args.ondevice:
                return trainer.train_denoiser_ondevice(
                    model, patches, sig, steps=steps, batch_size=args.batch,
                    cfg=cfg, params=params, seed=seed, ckpt_cb=ckpt_cb,
                    ckpt_every=ckpt_every, scan_steps=args.scan_steps,
                )
            return trainer.train_denoiser(
                model, patches, sig, steps=steps, batch_size=args.batch,
                cfg=cfg, mesh=mesh, params=params, seed=seed, ckpt_cb=ckpt_cb,
                ckpt_every=ckpt_every,
            )

        def save_bundle_ckpt(step, p, _path=args.out):
            # replicate the sole trained tree across all 25 bins so the
            # file ALWAYS loads as a valid bundle, even mid-center-bin
            stacked = jax.tree.map(
                lambda a: np.stack([np.asarray(a)] * 25), p)
            save(stacked, _path)
            print(json.dumps({"ckpt": _path, "step": step, "bin": center}),
                  flush=True)

        p_c, losses = run_train(
            (2 * center + 1) / 255.0, args.steps,
            ckpt_cb=save_bundle_ckpt if args.ckpt_every else None,
            ckpt_every=args.ckpt_every,
        )
        bins[center] = p_c
        print(json.dumps({"bin": center, "losses": losses[-2:]}), flush=True)
        for direction in (-1, 1):
            prev = p_c
            b = center + direction
            while 0 <= b <= 24:
                prev, losses = run_train(
                    (2 * b + 1) / 255.0, args.bundle_steps, params=prev,
                    seed=b,
                )
                bins[b] = prev
                print(json.dumps({"bin": b, "losses": losses[-1:]}), flush=True)
                # checkpoint the partial bundle (missing bins fall back to
                # the nearest trained neighbor so the file always loads)
                full = [bins.get(i) or bins[min(bins, key=lambda k: abs(k - i))]
                        for i in range(25)]
                stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *full)
                save(stacked, args.out)
                b += direction
        print(json.dumps({"out": args.out, "bins": sorted(bins),
                          "patches": len(patches)}))
        return 0

    init_params = None
    if args.resume:
        init_params = convert.load_npz(args.resume)
        # zoo checkpoints may be stored f16 (deployment size); training
        # must run f32 or the optimizer state inherits half precision
        import jax as _jax

        init_params = _jax.tree.map(
            lambda a: np.asarray(a, np.float32)
            if np.asarray(a).dtype == np.float16 else a,
            init_params,
        )

    if args.synth:
        from pnp_admm_cnc_mri_tpu.train import synth as synth_mod

        teacher_apply = teacher_params = None
        if args.distill:
            import jax.numpy as jnp

            teacher = UNetRes(out_nc=1, nc=(64, 128, 256, 512), nb=4)
            teacher_params = convert.load_npz(args.distill)

            def teacher_apply(tp, noisy, sig):
                sm = jnp.broadcast_to(sig, noisy.shape)
                return teacher.apply(tp, jnp.concatenate([noisy, sm],
                                                         axis=-1))

        generator = synth_mod.make_generator(
            size=args.synth_size, seeds=synth_mod.load_warp_seeds(),
            n_disks=args.synth_disks)
        params, losses = trainer.train_denoiser_stream(
            model, generator, sigma, steps=args.steps,
            batch_size=args.batch, patch=args.patch, cfg=cfg,
            buffer_images=args.synth, refresh_every=args.synth_refresh,
            conditioned=conditioned, ffdnet_style=ffdnet_style,
            params=init_params, ckpt_cb=ckpt_cb,
            ckpt_every=args.ckpt_every, ema_decay=args.ema,
            scan_steps=args.scan_steps, teacher_apply=teacher_apply,
            teacher_params=teacher_params,
            distill_weight=args.distill_weight,
        )
    elif args.ondevice:
        params, losses = trainer.train_denoiser_ondevice(
            model, patches, sigma, steps=args.steps, batch_size=args.batch,
            cfg=cfg, conditioned=conditioned, ffdnet_style=ffdnet_style,
            params=init_params, ckpt_cb=ckpt_cb, ckpt_every=args.ckpt_every,
            ema_decay=args.ema, scan_steps=args.scan_steps,
        )
    else:
        params, losses = trainer.train_denoiser(
            model, patches, sigma, steps=args.steps, batch_size=args.batch,
            cfg=cfg, mesh=mesh, conditioned=conditioned,
            ffdnet_style=ffdnet_style, params=init_params,
            ckpt_cb=ckpt_cb, ckpt_every=args.ckpt_every,
        )
    save(params, args.out)
    print(json.dumps({
        "out": args.out, "losses": losses[-3:],
        "patches": (f"synth:{args.synth}" if args.synth else len(patches)),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
