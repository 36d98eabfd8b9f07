"""Evaluate round-3 synth-trained checkpoints: the corpus scaling curve.

Runs pnp_fista_d (the framework's best single-mask solver) on set1 and
the full set for each candidate weights file, at the incumbent tuned
drunet settings, and appends JSONL rows. The 3+ fixed-buffer points
(synth128/1024/8192) + the stream point form the VERDICT r2 #2 scaling
curve; the incumbent clean drunet is re-evaluated as the reference
point.

    python scripts/eval_r3_weights.py --weights /tmp/zoo_r3/drunet_synth128.npz,... \
        --out results/scaling_r3.jsonl [--model drunet_gray] [--sets set1,set]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True,
                   help="comma list of npz paths ('clean' = incumbent)")
    p.add_argument("--model", default="drunet_gray")
    p.add_argument("--algo", default="pnp_fista_d")
    p.add_argument("--sets", default="set1,set")
    p.add_argument("--extra", default="", help="extra CLI args, space-sep")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pnp_admm_cnc_mri_tpu.cli import main as cli_main
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    for wpath in args.weights.split(","):
        wpath = wpath.strip()
        for ts in args.sets.split(","):
            argv_cli = [args.algo, "--cpu", "--model", args.model,
                        "--tuned", "--testset", ts, "--no_save",
                        "--results_dir", "/tmp/eval_r3_results"]
            if wpath == "clean":
                argv_cli += ["--clean"]
            else:
                argv_cli += ["--weights", wpath]
            if args.extra:
                argv_cli += args.extra.split()
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf):
                    cli_main.main(argv_cli)
                line = buf.getvalue().strip().splitlines()[-1]
                res = json.loads(line)
            except Exception as e:  # keep sweeping on individual failures
                res = {"error": repr(e)}
            row = {"weights": os.path.basename(wpath), "testset": ts,
                   "model": args.model, "algo": args.algo, **res,
                   # full resolved argv (VERDICT r3 #5): every row must be
                   # reproducible from its own record — sweeps over --extra
                   # previously wrote indistinguishable rows
                   "argv": argv_cli, "weights_path": wpath}
            row.pop("wall_s", None)
            logger_mod.append_record(args.out, row)
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
