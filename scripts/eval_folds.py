"""Back-compat wrapper: fold-exclusion scoring moved into the package.

The canonical entry point is now

    python -m pnp_admm_cnc_mri_tpu.cli.eval_folds --manifest model_zoo/folds.json ...

This wrapper keeps the historical --zoo/--suffix interface used by the
round-4 campaign scripts: it synthesizes a manifest for the requested
zoo directory and delegates to the package CLI (one protocol, one
implementation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

FOLDS = {
    "fold1": ("01", "02", "03"),
    "fold2": ("04", "05", "06"),
    "fold3": ("07", "08", "09"),
    "fold4": ("10", "11", "12"),
    "fold5": ("13", "14", "15"),
}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--zoo", default="model_zoo")
    p.add_argument("--suffix", default="")
    p.add_argument("--out", default="results/r4_fold_eval.jsonl")
    p.add_argument("--algo", default="pnp_fista_d")
    p.add_argument("--mask", default=None)
    p.add_argument("--select_nlm", default=None)
    p.add_argument("--extra", default="")
    args = p.parse_args(argv)

    from pnp_admm_cnc_mri_tpu.cli import eval_folds as ef

    manifest = {"model": "drunet_gray", "folds": {}}
    for fold, held in FOLDS.items():
        name = (f"drunet_{fold}{args.suffix}.npz" if args.zoo != "model_zoo"
                else f"drunet_gray_clean_{fold}.npz")
        manifest["folds"][fold] = {
            "weights": os.path.join(args.zoo, name),
            "held_out": list(held),
        }
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(manifest, f)
        mpath = f.name

    fwd = ["--manifest", mpath, "--algo", args.algo, "--out", args.out]
    if args.mask:
        fwd += ["--mask", args.mask]
    if args.select_nlm:
        fwd += ["--select_nlm", args.select_nlm]
    if args.extra:
        fwd += ["--extra", args.extra]
    try:
        return ef.main(fwd)
    finally:
        os.unlink(mpath)


if __name__ == "__main__":
    raise SystemExit(main())
