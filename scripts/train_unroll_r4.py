"""Round-4 unrolled end-to-end drunet training (train/unroll.py).

Trains the incumbent clean drunet THROUGH the 10-iteration FISTA solve
(all three reference masks, random k-space noise at the reference's
std~15 scale), on the leakage-free mix of the on-device synth stream and
clean-corpus 256-crops. Leakage-free by construction: no test image is
ever seen.

    python scripts/train_unroll_r4.py --steps 1500 --iters 10 \
        --out zoo_r4/drunet_unroll10.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def load_real_256(corpus_dir: str, extra_dirs=()) -> np.ndarray:
    """All corpus images with min side >= 256, center-cropped to 256^2."""
    from PIL import Image

    out = []
    for d in (corpus_dir, *extra_dirs):
        for f in sorted(os.listdir(d)):
            if not f.endswith(".png"):
                continue
            img = np.asarray(Image.open(os.path.join(d, f)).convert("L"),
                             np.float32) / 255.0
            h, w = img.shape
            if min(h, w) < 256:
                continue
            top, left = (h - 256) // 2, (w - 256) // 2
            out.append(img[top:top + 256, left:left + 256])
    return np.stack(out) if out else np.zeros((0, 256, 256), np.float32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--iters", type=int, default=10,
                   help="unrolled FISTA iterations (eval with the same "
                        "--iter_num)")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--nlm", type=float, default=12.0)
    p.add_argument("--model_sigma1", type=float, default=15.0)
    p.add_argument("--resume", default="model_zoo/drunet_gray_clean.npz")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt_every", type=int, default=100)
    p.add_argument("--ema", type=float, default=0.999)
    p.add_argument("--real_fraction", type=float, default=0.5)
    p.add_argument("--noise_jitter", type=float, default=0.3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--masks", default="all",
                   help="'all' or comma list of mask names")
    p.add_argument("--real_pngs", default=None,
                   help="comma list of 256^2 grayscale PNGs to use as the "
                        "real-image pool INSTEAD of the clean-corpus crops "
                        "(fold-wise unrolled training: pass the 12 "
                        "non-fold test images — leakage-free for the "
                        "excluded fold by construction)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pnp_admm_cnc_mri_tpu import config as cfg_mod
    from pnp_admm_cnc_mri_tpu.data import masks as masks_mod
    from pnp_admm_cnc_mri_tpu.models import convert
    from pnp_admm_cnc_mri_tpu.models.drunet import UNetRes
    from pnp_admm_cnc_mri_tpu.train import synth as synth_mod, unroll

    mask_names = (list(cfg_mod.MASK_NAMES) if args.masks == "all"
                  else args.masks.split(","))
    masks = np.stack([np.asarray(masks_mod.load_mask(n), np.float32)
                      for n in mask_names])

    model = UNetRes(out_nc=1, nc=(64, 128, 256, 512), nb=4)
    params = convert.load_npz(args.resume)
    params = jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if np.asarray(a).dtype == np.float16 else a, params)

    if args.real_pngs:
        from PIL import Image

        real = np.stack([
            np.asarray(Image.open(p.strip()).convert("L"), np.float32) / 255.0
            for p in args.real_pngs.split(",")])
    else:
        real = load_real_256("scripts/clean_corpus")
    print(f"real 256-crops: {len(real)}  masks: {mask_names}", flush=True)

    generator = synth_mod.make_generator(
        size=256, seeds=synth_mod.load_warp_seeds(), n_disks=600)

    denoise = unroll.make_drunet_ladder_denoise(
        model, args.iters, nlm255=args.nlm, model_sigma1=args.model_sigma1)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    def ckpt_cb(step, p):
        convert.save_npz(jax.tree.map(np.asarray, p), args.out)
        print(json.dumps({"ckpt": args.out, "step": step}), flush=True)

    params, losses = unroll.train_unrolled(
        model, denoise, masks, iter_num=args.iters, generator=generator,
        real_images=real, steps=args.steps, batch_size=args.batch,
        learning_rate=args.lr, noise_std=15.0,
        noise_jitter=args.noise_jitter, params=params,
        ckpt_cb=ckpt_cb, ckpt_every=args.ckpt_every, ema_decay=args.ema,
        real_fraction=args.real_fraction,
    )
    print(json.dumps({"out": args.out, "losses": losses[-5:],
                      "argv": sys.argv[1:]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
