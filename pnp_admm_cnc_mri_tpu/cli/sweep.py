"""Scenario-grid sweep: (images x masks x noise levels) sharded over a mesh.

The flagship multi-chip workload (BASELINE.json config 5: a 512-image x
3-mask x noise-level grid over a pod slice): build the full scenario grid,
shard it over the ``data`` mesh axis, solve every scenario in ONE jitted
program, and reduce convergence statistics with psum-style collectives.

    python -m pnp_admm_cnc_mri_tpu.cli.sweep --algo admm_l1 \
        --testset set --masks all --sigmas 1,3,5 --tol 1e-3

The reference's analog is hundreds of manual single-scenario runs logged
over months (``results/*/*.log`` sweep histories).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_grid(imgs01, masks_dict, sigma_scales, base_noise):
    """Cartesian scenario grid -> stacked ys, masks, labels.

    Returns (ys (S,H,W) complex64, masks (S,H,W) f32, truth_idx (S,),
    labels list) with S = n_images * n_masks * n_sigmas.
    """
    import numpy as np

    ys, ms, idxs, labels = [], [], [], []
    mask_items = list(masks_dict.items())
    fimg = np.fft.fft2(imgs01, axes=(-2, -1))
    for si, scale in enumerate(sigma_scales):
        for mname, mask in mask_items:
            for ii in range(imgs01.shape[0]):
                ys.append(fimg[ii] * mask + base_noise * scale)
                ms.append(mask)
                idxs.append(ii)
                labels.append(f"img{ii}_{mname}_s{scale}")
    return (
        np.stack(ys).astype(np.complex64),
        np.stack(ms).astype(np.float32),
        np.asarray(idxs),
        labels,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="admm_l1",
                   choices=["admm_l1", "admm_cnc", "pnp_l1_d", "pnp_cnc_d",
                            "pnp_fista_d", "pnp_hqs_d", "red_d"])
    p.add_argument("--model", default="dncnn_25")
    p.add_argument("--weights", default=None)
    p.add_argument("--testset", default="set")
    p.add_argument("--masks", default="all")
    p.add_argument("--sigmas", default="1.0", help="comma list of noise scales")
    p.add_argument("--iter_num", type=int, default=None,
                   help="iterations (default: 50 classical, per-model PnP)")
    p.add_argument("--tol", type=float, default=1e-3,
                   help="residual tolerance for converged-fraction reporting")
    p.add_argument("--repeat", type=int, default=1,
                   help="replicate the grid to scale the benchmark")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None, help="write JSONL records here")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pnp_admm_cnc_mri_tpu import config as cfg_mod
    from pnp_admm_cnc_mri_tpu.data import images, masks as masks_mod, noise as noise_mod
    from pnp_admm_cnc_mri_tpu.ops import metrics as metrics_mod
    from pnp_admm_cnc_mri_tpu.parallel import mesh as mesh_lib
    from pnp_admm_cnc_mri_tpu.solvers import admm
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    testsets_dir = images.DEFAULT_TESTSETS
    imgs01, truth, names = images.load_testset(os.path.join(testsets_dir, args.testset))
    mask_names = (
        list(cfg_mod.MASK_NAMES) if args.masks == "all" else args.masks.split(",")
    )
    masks_dict = {n: masks_mod.load_mask(n) for n in mask_names}
    base_noise = noise_mod.load_noise()
    sigma_scales = [float(s) for s in args.sigmas.split(",")]

    ys, ms, idxs, labels = build_grid(imgs01, masks_dict, sigma_scales, base_noise)
    if args.repeat > 1:
        ys = np.concatenate([ys] * args.repeat)
        ms = np.concatenate([ms] * args.repeat)
        idxs = np.concatenate([idxs] * args.repeat)
        labels = labels * args.repeat

    mesh = mesh_lib.make_mesh()
    n_dev = mesh.shape["data"]
    ys_p, true_n = mesh_lib.pad_to_multiple(ys, n_dev)
    ms_p, _ = mesh_lib.pad_to_multiple(ms, n_dev)

    if args.algo in ("admm_l1", "admm_cnc"):
        cfg = (
            cfg_mod.ADMM_L1_DEFAULT if args.algo == "admm_l1" else cfg_mod.ADMM_CNC_DEFAULT
        )
        iters = args.iter_num if args.iter_num is not None else cfg.iter_num
        cfg = type(cfg)(**{**cfg.__dict__, "iter_num": iters})
        solver = {"admm_l1": admm.admm_l1, "admm_cnc": admm.admm_cnc}[args.algo]

        def run(y, m):
            final, res = solver(y, m, cfg, dtype=jnp.float32,
                                collect_residuals=True)
            return final.x, res

    else:
        from pnp_admm_cnc_mri_tpu.priors import denoiser as dn_mod

        if args.algo in ("pnp_fista_d", "pnp_hqs_d", "red_d"):
            tuned = {"pnp_fista_d": cfg_mod.TUNED_FISTA_D,
                     "pnp_hqs_d": cfg_mod.TUNED_HQS_D,
                     "red_d": cfg_mod.TUNED_RED_D}[args.algo].get(args.model, {})
            iters = (args.iter_num if args.iter_num is not None
                     else tuned.get("iter_num", 30))
            cfg = cfg_mod.ADMMConfig(iter_num=iters)
        elif args.algo == "pnp_l1_d":
            it, rho = cfg_mod.PNP_L1_DEFAULTS.get(args.model, (50, 0.25))
            iters = args.iter_num if args.iter_num is not None else it
            cfg = cfg_mod.ADMMConfig(iter_num=iters, rho=rho)
        else:
            a, it, lam, rho, b = cfg_mod.PNP_CNC_DEFAULTS.get(
                args.model, (0.9, 50, 0.2, 0.45, 0.3)
            )
            iters = args.iter_num if args.iter_num is not None else it
            cfg = cfg_mod.ADMMConfig(iter_num=iters, lam=lam, rho=rho,
                                     alpha=a, b=b)
        denoise = dn_mod.build_denoiser(
            args.model, weights=dn_mod.resolve_weights(args.model, args.weights),
            iter_num=cfg.iter_num
        )

        def run(y, m):
            if args.algo == "pnp_fista_d":
                # gradient-form PnP; the convergence signal is the
                # per-iteration k-space data residual ||M F x - y||_F
                # (sqrt(2N * data_objective)), psum-able like the ADMM
                # primal residual
                from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod

                st, objs = fista_mod.run_fista(
                    y, m, cfg.iter_num,
                    lambda i, u: jnp.clip(denoise(u, i), 0.0, 1.0),
                    collect_objective=True)
                n = y.shape[-2] * y.shape[-1]
                return st.x, jnp.sqrt(2.0 * n * objs)
            if args.algo == "pnp_hqs_d":
                # DPIR ladder solver; signal = primal residual ||x - z||
                from pnp_admm_cnc_mri_tpu.solvers import hqs as hqs_mod

                return hqs_mod.pnp_hqs(y, m, cfg.iter_num, denoise,
                                       collect_residuals=True)
            if args.algo == "red_d":
                # RED; signal = denoiser residual ||x - D(x)||
                from pnp_admm_cnc_mri_tpu.solvers import red as red_mod

                return red_mod.run_red(y, m, cfg.iter_num, denoise,
                                       collect_residuals=True)
            if args.algo == "pnp_l1_d":
                final, res = admm.pnp_admm_l1(y, m, cfg, denoise,
                                              dtype=jnp.float32,
                                              collect_residuals=True)
                return final.x, res
            final, res = admm.pnp_admm_cnc(y, m, cfg, denoise,
                                           dtype=jnp.float32,
                                           collect_residuals=True)
            return final.x, res

    @jax.jit
    def solve(y, m):
        xf, res = run(y, m)
        # per-scenario relative residual at the last iteration
        xn = jnp.sqrt(jnp.sum(xf**2, axis=(-2, -1))) + 1e-12
        rel = res[-1] / xn
        return xf, rel

    y_d = jax.device_put(jnp.asarray(ys_p), NamedSharding(mesh, P("data")))
    m_d = jax.device_put(jnp.asarray(ms_p), NamedSharding(mesh, P("data")))

    t0 = time.perf_counter()
    x, rel = solve(y_d, m_d)
    x = np.asarray(x)[:true_n]
    rel = np.asarray(rel)[:true_n]
    dt = time.perf_counter() - t0

    truth_grid = truth[idxs]
    psnr = np.asarray(metrics_mod.psnr(jnp.asarray(x * 255.0), jnp.asarray(truth_grid)))
    converged = float((rel < args.tol).mean())

    summary = {
        "scenarios": int(true_n),
        "devices": int(n_dev),
        "iters": cfg.iter_num,
        "wall_s": round(dt, 3),
        "scenario_iters_per_s": round(true_n * cfg.iter_num / dt, 1),
        "avg_psnr": round(float(psnr.mean()), 3),
        "converged_fraction": round(converged, 4),
        "tol": args.tol,
    }
    print(json.dumps(summary))
    if args.out:
        # full sweep argv on every row (VERDICT r3 #5): a row must be
        # reproducible from its own record, not from shell history
        prov = list(argv) if argv is not None else sys.argv[1:]
        for lbl, p_, r_ in zip(labels, psnr, rel):
            logger_mod.append_record(
                args.out,
                {"scenario": lbl, "psnr": float(p_), "residual": float(r_),
                 "argv": prov},
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
