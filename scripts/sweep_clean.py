"""Hyperparameter re-sweep for the leakage-free (clean) weights.

The TUNED_* registries were swept for the round-1 test-set-trained
weights; the clean retrains have different optimal (rho, nlm, iters).
Runs the CLI in-process on CPU over a small grid and appends JSONL.

    python scripts/sweep_clean.py --algo pnp_l1_d --model drunet_gray \
        --weights /tmp/zoo_clean/drunet_gray_clean.npz \
        --iters 4 --rhos 0.3,0.45,0.7 --nlms 3,5,8 --out /tmp/sweep.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="pnp_l1_d")
    p.add_argument("--model", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--testset", default="set1")
    p.add_argument("--iters", default="4")
    p.add_argument("--rhos", default="")
    p.add_argument("--nlms", default="")
    p.add_argument("--alphas", default="")
    p.add_argument("--x8", action="store_true")
    p.add_argument("--extra", default="", help="extra CLI args, space-sep")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    def parse(s, cast=float):
        return [cast(v) for v in s.split(",") if v] or [None]

    import contextlib
    import io

    rows = []
    for it in parse(args.iters, int):
        for rho in parse(args.rhos):
            for nlm in parse(args.nlms):
                for alpha in parse(args.alphas):
                    argv_cli = [args.algo, "--cpu", "--model", args.model,
                                "--weights", args.weights,
                                "--testset", args.testset, "--no_save",
                                "--results_dir", "/tmp/sweep_results"]
                    if it is not None:
                        argv_cli += ["--iter_num", str(it)]
                    if rho is not None:
                        argv_cli += ["--reo", str(rho)]
                    if nlm is not None:
                        argv_cli += ["--nlm", str(nlm)]
                    if alpha is not None:
                        argv_cli += ["--alpha", str(alpha)]
                    if args.x8:
                        argv_cli += ["--x8"]
                    else:
                        argv_cli += ["--no_x8"]
                    if args.extra:
                        argv_cli += args.extra.split()
                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        cli_main.main(argv_cli)
                    out = json.loads(buf.getvalue().strip().splitlines()[-1])
                    row = dict(algo=args.algo, model=args.model, iters=it,
                               rho=rho, nlm=nlm, alpha=alpha,
                               testset=args.testset,
                               psnr=round(out["psnr"], 3),
                               ssim=round(out["ssim"], 4))
                    rows.append(row)
                    with open(args.out, "a") as fh:
                        fh.write(json.dumps(row) + "\n")
                    print(json.dumps(row), flush=True)
    best = max(rows, key=lambda r: r["psnr"])
    print("BEST:", json.dumps(best), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
