"""Hyperparameter sweep for the PnP-HQS / RED MRI pipelines
(TUNED_HQS_D / TUNED_RED_D).

Runs the CLI in-process on CPU over a (nlm x sigma255 x lam x iters
[x ms1]) grid with the clean weights and appends JSONL.

    python scripts/sweep_hqs.py --model ffdnet_gray \
        --nlms 8,10,12,15 --sigmas 5,10,20 --iters 30 --out /tmp/hqs.jsonl
    python scripts/sweep_hqs.py --algo red_d --model ffdnet_gray \
        --nlms 8,10 --lams 0.1,0.3,1.0 --iters 50 --out /tmp/red.jsonl
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys

sys.path.insert(0, "/root/repo")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="pnp_hqs_d",
                   choices=["pnp_hqs_d", "red_d"])
    p.add_argument("--model", required=True)
    p.add_argument("--testset", default="set1")
    p.add_argument("--iters", default="30")
    p.add_argument("--nlms", default="")
    p.add_argument("--sigmas", default="")
    p.add_argument("--lams", default="")
    p.add_argument("--ms1s", default="", help="model_sigma1 values (default: ladder default 49)")
    p.add_argument("--x8", action="store_true")
    p.add_argument("--extra", default="", help="extra CLI args, space-sep")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    def parse(s, cast=float):
        return [cast(v) for v in s.split(",") if v] or [None]

    rows = []
    for it in parse(args.iters, int):
      for nlm in parse(args.nlms):
        for sig in parse(args.sigmas):
          for lam in parse(args.lams):
            for ms1 in parse(args.ms1s):
                argv_cli = [args.algo, "--cpu", "--model", args.model,
                            "--clean", "--testset", args.testset,
                            "--no_save", "--results_dir",
                            "/tmp/sweep_results", "--iter_num", str(it)]
                if nlm is not None:
                    argv_cli += ["--nlm", str(nlm)]
                if sig is not None:
                    argv_cli += ["--noise_sigma", str(sig)]
                if lam is not None:
                    argv_cli += ["--lambda1", str(lam)]
                if ms1 is not None:
                    argv_cli += ["--model_sigma1", str(ms1)]
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
                           nlm=nlm, sigma255=sig, lam=lam, ms1=ms1,
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
