"""Compose the k-fold fold-exclusion score (VERDICT r3 #1 protocol).

Each of the 15 test images is scored by the fold model that EXCLUDED it
from training (leakage-free by construction). Runs pnp_fista_d --tuned
per fold model over the full set, takes each model's held-out per-image
PSNRs, and composes the 15-image average; set1 (05.png) comes from the
fold-2 model.

    python scripts/eval_folds.py --zoo zoo_r4 --out results/r4_fold_eval.jsonl
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

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
    p.add_argument("--mask", default=None,
                   help="single-mask algos: evaluate under this mask "
                        "(default Q_Random30)")
    p.add_argument("--extra", default="",
                   help="extra CLI args, space-separated (e.g. '--nlm 13')")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pnp_admm_cnc_mri_tpu.cli import main as cli_main
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    composite = {}
    per_fold = {}
    for fold, held in FOLDS.items():
        name = (f"drunet_{fold}{args.suffix}.npz" if args.zoo != "model_zoo"
                else f"drunet_gray_clean_{fold}.npz")
        wpath = os.path.join(args.zoo, name)
        if not os.path.exists(wpath):
            print(f"MISSING {wpath} — skipping", flush=True)
            continue
        argv_cli = [args.algo, "--cpu", "--model", "drunet_gray", "--tuned",
                    "--testset", "set", "--no_save", "--results_dir",
                    "/tmp/eval_folds_results", "--weights", wpath]
        if args.mask:
            argv_cli += ["--mask", args.mask]
        if args.extra:
            argv_cli += args.extra.split()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cli_main.main(argv_cli)
        res = json.loads(buf.getvalue().strip().splitlines()[-1])
        pim = res["per_image_psnr"]
        held_vals = {k: pim[k] for k in held}
        composite.update(held_vals)
        per_fold[fold] = {"avg_all": res["psnr"], "held_out": held_vals}
        row = {"fold": fold, "weights": wpath, "argv": argv_cli, **res}
        logger_mod.append_record(args.out, row)
        print(json.dumps({"fold": fold,
                          "held_out": {k: round(v, 3)
                                       for k, v in held_vals.items()}}),
              flush=True)

    if len(composite) == 15:
        avg = sum(composite.values()) / 15.0
        summary = {
            "composite_fold_exclusion_psnr": round(avg, 3),
            "set1_fold_excluded": round(composite["05"], 3),
            "per_image": {k: round(v, 3) for k, v in sorted(composite.items())},
            "protocol": "each image scored by the fold model excluding it",
        }
        logger_mod.append_record(args.out, summary)
        print(json.dumps(summary))
    else:
        print(f"composite incomplete: {sorted(composite)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
