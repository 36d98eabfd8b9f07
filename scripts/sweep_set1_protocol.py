"""Contest the reference's Set1 best-observed under ITS OWN protocol.

The reference's 32.86 dB "Set1" number
(`/root/reference/results/Set1_dn_ircnn_gray/Set1_dn_ircnn_gray.log`) is
a per-image sweep cherry-pick over 118 logged runs — and the log shows
the Set1 folder's CONTENT changed across the sweep (02/03/05/06/11/13/22
.png all appear; the 32.8626 best is image **11.png** at alpha 1.150,
21-06-28 14:39; the best ever logged for 05.png — today's testsets/set1
content — is 30.0003). Our fixed-registry leakage-free numbers compare
like-for-like per image:

  05.png: ours 31.653 (fold-excluded, no sweep)  vs ref best 30.000
  11.png: ours 33.933 (fold-excluded, no sweep)  vs ref best 32.863

This script plays the reference's exact game on top: a per-image
hyper-parameter sweep (solver family x nlm x model_sigma1 x iters),
single mask Q_Random30, using the FOLD-EXCLUDED weights (the model that
never saw the image), recording every run's argv + PSNR so our
"best-observed" is earned under the same protocol. Runs on the TPU by
default (~40 s/config; pass --cpu off-chip).

    python scripts/sweep_set1_protocol.py --out results/r5_set1_sweep.jsonl
"""

from __future__ import annotations

import argparse
import contextlib
import io
import itertools
import json
import sys

sys.path.insert(0, "/root/repo")

# image -> the fold model that EXCLUDED it (model_zoo/folds.json)
FOLD_OF = {"05": "fold2", "11": "fold4"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--images", default="05,11")
    p.add_argument("--families", default="pnp_fista_d,pnp_l1_d,pnp_pgd_d")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="results/r5_set1_sweep.jsonl")
    p.add_argument("--limit", type=int, default=0,
                   help="stop after N configs per (image, family) (0=all)")
    args = p.parse_args(argv)

    from pnp_admm_cnc_mri_tpu.cli import main as cli_main
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    NLMS = [8.0, 10.0, 12.0, 14.0, 16.0, 18.0]
    MS1 = [None, 49.0]
    ITERS = [30, 40]

    best = {}
    for image in args.images.split(","):
        weights = f"model_zoo/drunet_gray_clean_{FOLD_OF[image]}.npz"
        for family in args.families.split(","):
            n_run = 0
            for nlm, ms1, it in itertools.product(NLMS, MS1, ITERS):
                if args.limit and n_run >= args.limit:
                    break
                argv_cli = [family, "--model", "drunet_gray", "--tuned",
                            "--testset", "set", "--images", image,
                            "--no_save", "--results_dir",
                            "/tmp/sweep_results", "--weights", weights,
                            "--nlm", repr(nlm), "--iter_num", str(it)]
                if ms1 is not None:
                    argv_cli += ["--model_sigma1", repr(ms1)]
                if args.cpu:
                    argv_cli += ["--cpu"]
                buf = io.StringIO()
                try:
                    with contextlib.redirect_stdout(buf):
                        cli_main.main(argv_cli)
                    res = json.loads(buf.getvalue().strip().splitlines()[-1])
                except Exception as e:  # noqa: BLE001 — record and move on
                    logger_mod.append_record(args.out, {
                        "image": image, "family": family, "argv": argv_cli,
                        "error": str(e)[:300]})
                    continue
                psnr = res["per_image_psnr"][image]
                row = {"image": image, "family": family, "weights": weights,
                       "nlm": nlm, "model_sigma1": ms1, "iter_num": it,
                       "psnr": round(psnr, 4), "argv": argv_cli}
                logger_mod.append_record(args.out, row)
                key = image
                if key not in best or psnr > best[key]["psnr"]:
                    best[key] = row
                    print(json.dumps({"new_best": row}), flush=True)
                n_run += 1

    summary = {"protocol": "per-image sweep-best, fold-excluded weights, "
                           "single mask Q_Random30 (the reference's own "
                           "best-observed game)",
               "best": {k: {kk: v[kk] for kk in
                            ("family", "nlm", "model_sigma1", "iter_num",
                             "psnr")}
                        for k, v in best.items()},
               "reference_best": {"05": 30.0003, "11": 32.8626}}
    logger_mod.append_record(args.out, summary)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
