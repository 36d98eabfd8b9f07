"""CPU hyper-parameter sweep for the tuned PnP-IRCNN schedule (set1).

The round-9 ircnn bundle is at its training asymptote (STATUS.md); this
sweeps the *schedule* knobs instead — iter_num, rho, and the sigma-ladder
endpoint noise_level_model — mirroring how the reference's own set1
numbers are sweep last-runs (results/Set1_dn_ircnn_gray/*.log, 100+ runs).

Usage: python scripts/sweep_ircnn_schedule.py [--full]
"""

from __future__ import annotations

import argparse
import itertools
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--testset", default="set1")
    ap.add_argument("--scheme", default="l1", choices=["l1", "cnc"])
    ap.add_argument("--iters", default="4,5,6")
    ap.add_argument("--rhos", default="1.0,1.2,1.4,1.6")
    ap.add_argument("--nlms", default="10,15,20")
    ap.add_argument("--alphas", default="0.8", help="cnc only")
    args = ap.parse_args()

    from pnp_admm_cnc_mri_tpu import config as cfg_mod
    from pnp_admm_cnc_mri_tpu.cli import experiments
    from pnp_admm_cnc_mri_tpu.priors import denoiser as dmod

    weights = dmod.resolve_weights("ircnn_gray", None)
    iters = [int(v) for v in args.iters.split(",")]
    rhos = [float(v) for v in args.rhos.split(",")]
    nlms = [float(v) for v in args.nlms.split(",")]
    alphas = [float(v) for v in args.alphas.split(",")]

    best = (-1.0, None)
    for it, rho, nlm, alpha in itertools.product(iters, rhos, nlms, alphas):
        denoise = dmod.build_denoiser(
            "ircnn_gray", weights=weights, iter_num=it,
            noise_level_model=nlm / 255.0, x8=False,
        )
        if args.scheme == "l1":
            cfg = cfg_mod.ADMMConfig(iter_num=it, rho=rho)
            out = experiments.run_pnp(
                denoise, cfg, scheme="l1", testset=args.testset,
                save_images=False, result_tag="sweep_ircnn",
                results_dir="/tmp/sweep_results",
            )
        else:
            base = cfg_mod.PNP_CNC_DEFAULTS["ircnn_gray"]
            cfg = cfg_mod.ADMMConfig(
                iter_num=it, lam=base[2], rho=rho, alpha=alpha, b=base[4]
            )
            out = experiments.run_pnp(
                denoise, cfg, scheme="cnc", testset=args.testset,
                save_images=False, result_tag="sweep_ircnn",
                results_dir="/tmp/sweep_results",
            )
        row = dict(iter=it, rho=rho, nlm=nlm, alpha=alpha,
                   psnr=round(out["psnr"], 3), ssim=round(out["ssim"], 4))
        print(row, flush=True)
        if out["psnr"] > best[0]:
            best = (out["psnr"], row)
    print("BEST:", best[1])


if __name__ == "__main__":
    main()
