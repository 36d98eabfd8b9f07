"""Command-line entry point.

Usage (mirrors the reference's six experiment scripts, but with real flags
instead of editing integer indices in module bodies — reference
``【3】:375-378``):

    python -m pnp_admm_cnc_mri_tpu.cli.main admm_l1  --mask Q_Random30 --testset set1
    python -m pnp_admm_cnc_mri_tpu.cli.main admm_cnc --mask Q_Cartesian30 --alpha 0.45 --b 64
    python -m pnp_admm_cnc_mri_tpu.cli.main pnp_l1_d   --model dncnn_25 --weights model_zoo/dncnn_25.pth
    python -m pnp_admm_cnc_mri_tpu.cli.main pnp_cnc_d  --model drunet_gray ...
    python -m pnp_admm_cnc_mri_tpu.cli.main pnp_l1_bm3d / pnp_cnc_bm3d
"""

from __future__ import annotations

import argparse
import json
import sys

from pnp_admm_cnc_mri_tpu.config import DEBLUR_KERNELS


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pnp_admm_cnc_mri_tpu")
    p.add_argument(
        "algo",
        choices=[
            "admm_l1",
            "admm_cnc",
            "pnp_l1_bm3d",
            "pnp_cnc_bm3d",
            "pnp_l1_d",
            "pnp_cnc_d",
            "consensus_l1",
            "consensus_d",
            "consensus_fista_d",
            "consensus_hqs_d",
            "pnp_sr",
            "pnp_deblur",
            "fista_l1",
            "pnp_fista_d",
            "pnp_hqs_d",
            "red_d",
            "pgd_l1",
            "pnp_pgd_d",
            "pnp_pgd_cnc",
        ],
    )
    p.add_argument("--red_variant", default="fp", choices=["fp", "gd"],
                   help="red_d only: fixed-point (implicit, default) or "
                        "explicit gradient-descent RED iteration")
    p.add_argument("--step", type=float, default=None,
                   help="fista_l1/pnp_fista_d/consensus_fista_d: gradient "
                        "step size (the data-term Lipschitz constant is "
                        "exactly 1, so 1.0 is canonical; default: tuned "
                        "registry value under --tuned, else 1.0)")
    p.add_argument("--sf", type=int, default=2,
                   help="pnp_sr only: super-resolution factor")
    p.add_argument("--kernel", default="aniso",
                   choices=list(DEBLUR_KERNELS),
                   help="pnp_deblur only: blur kernel")
    p.add_argument("--noise_sigma", type=float, default=None,
                   help="pnp_sr/pnp_deblur: degradation noise sigma on the "
                        "[0,255] scale (defaults: sr 1.5, deblur 2.55); "
                        "pnp_hqs_d: the alpha-ladder scale (default 10)")
    p.add_argument("--testset", default="set1")
    p.add_argument("--images", default=None,
                   help="comma-separated image stems (e.g. '05,11') to "
                        "restrict the testset — per-image sweeps pay for "
                        "1-2 images; observations match the full-set batch "
                        "slots exactly")
    p.add_argument("--mask", default="Q_Random30")
    p.add_argument("--iter_num", type=int, default=None)
    p.add_argument("--lambda1", dest="lam", type=float, default=None)
    p.add_argument("--reo", dest="rho", type=float, default=None)
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--b", type=float, default=None)
    p.add_argument("--tol", type=float, default=None, help="optional stop tolerance")
    p.add_argument("--model", default="dncnn_25", help="denoiser model name")
    p.add_argument("--model2", default=None, help="second denoiser (CNC slot 2)")
    p.add_argument("--weights", default=None, help=".pth or .npz weights path")
    p.add_argument("--weights2", default=None)
    p.add_argument("--testsets_dir", default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--results_dir", default="results")
    p.add_argument("--no_save", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="run the denoiser conv stack in bfloat16 (TPU MXU "
                        "fast path; measured quality-neutral, +-0.04 dB)")
    p.add_argument("--clean", action="store_true",
                   help="use the leakage-free model_zoo/<name>_clean.npz "
                        "weights (trained on a corpus disjoint from the "
                        "evaluation testsets; train/corpus.py) and, with "
                        "--tuned, the TUNED_*_CLEAN settings swept for "
                        "them. Reference-comparison claims use this path")
    p.add_argument("--tuned", action="store_true",
                   help="apply the framework's tuned settings for this "
                        "algorithm/model (config.TUNED_*, docs/USAGE.md "
                        "table) instead of the reference defaults; explicit "
                        "flags still override")
    p.add_argument("--nlm", type=float, default=None,
                   help="denoiser noise-level / sigma-ladder endpoint on the "
                        "reference's [0,255] scale (default: per-model 15)")
    p.add_argument("--model_sigma1", type=float, default=None,
                   help="sigma-ladder start for drunet/ircnn schedules "
                        "(reference utils_pnp.py:14 default 49)")
    p.add_argument("--x8", action="store_true",
                   help="x8 dihedral augmentation for the denoiser prior "
                        "(default ON for pnp_l1_d drunet, like the reference)")
    p.add_argument("--no_x8", action="store_true", help="force x8 off")
    p.add_argument("--f64", action="store_true", help="float64 (CPU parity mode)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--nc", type=int, default=None,
                   help="override the denoiser conv width (custom-width "
                        "checkpoints, e.g. tdnet variants)")
    p.add_argument("--nb", type=int, default=None,
                   help="override the denoiser depth (custom-depth "
                        "checkpoints)")
    return p


def _arch_overrides(args) -> dict:
    """--nc/--nb overrides for build_denoiser (custom-architecture
    checkpoints; parity models keep their fixed defaults when unset)."""
    kw = {}
    if getattr(args, "nc", None):
        kw["nc"] = args.nc
    if getattr(args, "nb", None):
        kw["nb"] = args.nb
    return kw


def _resolve_step(args, tuned=None) -> float:
    """Explicit --step always wins (even --step 1.0); otherwise the tuned
    registry's step, else the canonical 1.0 (L=1 data term)."""
    if args.step is not None:
        return args.step
    return (tuned or {}).get("step", 1.0)


def _warn_bm3d_ignored(args) -> None:
    """Warn on CNN-only knobs passed with --model bm3d (same policy as
    the restoration pipelines' _restoration_prior)."""
    ignored = [name for name, v in
               (("--weights", args.weights), ("--x8", args.x8),
                ("--bf16", args.bf16), ("--clean", args.clean),
                ("--model_sigma1", args.model_sigma1),
                ("--model2", args.model2), ("--weights2", args.weights2))
               if v]
    if ignored:
        import warnings

        warnings.warn(
            f"--model bm3d ignores {', '.join(ignored)} (CNN-only knobs)",
            stacklevel=2,
        )


def _merge_cfg(base, args):
    import dataclasses

    updates = {}
    for field in ("iter_num", "lam", "rho", "alpha", "b", "tol"):
        v = getattr(args, field)
        if v is not None:
            updates[field] = v
    return dataclasses.replace(base, **updates)


def _apply_tuned(base, tuned, args):
    """Apply a config.TUNED_* entry: ADMMConfig fields replace the base,
    the denoiser knob ``nlm`` backfills the flag (explicit flags win)."""
    import dataclasses

    from pnp_admm_cnc_mri_tpu import config as cfg_mod

    cfg_keys = {f.name for f in dataclasses.fields(cfg_mod.ADMMConfig)}
    base = dataclasses.replace(
        base, **{k: v for k, v in tuned.items() if k in cfg_keys}
    )
    if args.nlm is None:
        args.nlm = tuned.get("nlm")
    return base


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu import config as cfg_mod
    from pnp_admm_cnc_mri_tpu.cli import experiments

    common = dict(
        testset=args.testset,
        mask_name=args.mask,
        testsets_dir=args.testsets_dir,
        data_dir=args.data_dir,
        results_dir=args.results_dir,
        save_images=not args.no_save,
        only=args.images,
    )
    dtype = jnp.float64 if args.f64 else jnp.float32

    if args.algo in ("consensus_l1", "consensus_d", "consensus_fista_d",
                     "consensus_hqs_d"):
        # Multi-mask joint reconstruction: one shared z across all three
        # reference masks (new capability; no reference counterpart).
        # consensus_d plugs a model-zoo denoiser into the consensus z-prox.
        import numpy as np

        from pnp_admm_cnc_mri_tpu.cli.experiments import score_and_log
        from pnp_admm_cnc_mri_tpu.data import images as images_mod, masks as masks_mod, noise as noise_mod
        from pnp_admm_cnc_mri_tpu.parallel import consensus

        testsets_dir = args.testsets_dir or images_mod.DEFAULT_TESTSETS
        import os as _os

        imgs01, truth, names = images_mod.load_testset(
            _os.path.join(testsets_dir, args.testset)
        )
        if args.images:
            truth, _ = experiments._filter_only(truth, names, args.images)
            imgs01, names = experiments._filter_only(imgs01, names, args.images)
        all_masks = np.stack(list(masks_mod.load_all_masks(data_dir=args.data_dir).values()))
        kn = noise_mod.load_noise(args.data_dir)
        z_prox = None
        algo_tag = args.algo
        fista_iters = None
        if args.algo == "consensus_fista_d":
            # union-preconditioned multi-mask FISTA with a denoiser prox
            # (parallel/consensus.run_consensus_fista) — the framework's
            # best clean multi-mask numbers (TUNED_CONSENSUS_FISTA)
            from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

            tuned = (cfg_mod.TUNED_CONSENSUS_FISTA.get(args.model, {})
                     if args.tuned else {})
            fista_iters = args.iter_num or tuned.get("iter_num", 30)
            x8 = args.x8 or (not args.no_x8 and tuned.get("x8", False))
            nlm = args.nlm if args.nlm is not None else tuned.get("nlm")
            if args.model == "bm3d":
                from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

                _warn_bm3d_ignored(args)
                denoise = bm3d_prior.make_bm3d_denoiser(
                    noise_var=((nlm if nlm is not None else 15.0) / 255.0) ** 2
                )
                # clip like the single-mask pnp_fista_d bm3d path
                # (run_pnp_fista clamp=True) — measured slightly better
                # than the unclamped sweep (32.139 vs 32.122 set1)
                z_prox = lambda v, i: jnp.clip(denoise(v, i), 0.0, 1.0)
            else:
                ms1 = (args.model_sigma1 if args.model_sigma1 is not None
                       else tuned.get("model_sigma1"))
                extra_d = {"model_sigma1": ms1} if ms1 is not None else {}
                denoise = denoiser_mod.build_denoiser(
                    args.model,
                    weights=denoiser_mod.resolve_weights(
                        args.model, args.weights, clean=args.clean),
                    iter_num=fista_iters, x8=x8,
                    compute_dtype=jnp.bfloat16 if args.bf16 else None,
                    noise_level_model=denoiser_mod.nlm_for_model(args.model,
                                                                 nlm),
                    **extra_d,
                    **_arch_overrides(args),
                )
                z_prox = lambda v, i: jnp.clip(denoise(v, i), 0.0, 1.0)
            algo_tag = f"consensus_fista_{args.model}"
            base = cfg_mod.ADMM_L1_DEFAULT  # unused by the FISTA path
        elif args.algo == "consensus_hqs_d":
            # multi-mask HQS: EXACT joint k-space data solve + the DPIR
            # ladder denoiser (parallel/consensus.run_consensus_hqs) —
            # per-obs reductions happen once, outside the loop
            from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

            tuned = (cfg_mod.TUNED_CONSENSUS_HQS.get(args.model, {})
                     if args.tuned else {})
            hqs_iters = args.iter_num or tuned.get("iter_num", 30)
            x8 = args.x8 or (not args.no_x8 and tuned.get("x8", False))
            nlm = args.nlm if args.nlm is not None else tuned.get("nlm")
            hqs_sigma255 = (args.noise_sigma if args.noise_sigma is not None
                            else tuned.get("sigma255", 10.0))
            hqs_ms1 = (args.model_sigma1 if args.model_sigma1 is not None
                       else tuned.get("model_sigma1", 49.0))
            hqs_ms2 = nlm if nlm is not None else 15.0
            if args.model == "bm3d":
                from pnp_admm_cnc_mri_tpu.ops import schedules as schedules_mod
                from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

                _warn_bm3d_ignored(args)
                _, sigmas = schedules_mod.get_rho_sigma(
                    sigma=hqs_sigma255 / 255.0, iter_num=hqs_iters,
                    model_sigma1=hqs_ms1, model_sigma2=hqs_ms2)
                denoise = bm3d_prior.make_bm3d_ladder_denoiser(sigmas)
            else:
                denoise = denoiser_mod.build_denoiser(
                    args.model,
                    weights=denoiser_mod.resolve_weights(
                        args.model, args.weights, clean=args.clean),
                    iter_num=hqs_iters, x8=x8,
                    compute_dtype=jnp.bfloat16 if args.bf16 else None,
                    noise_level_model=denoiser_mod.nlm_for_model(args.model,
                                                                 nlm),
                    model_sigma1=hqs_ms1,
                    **_arch_overrides(args),
                )
            # z_prox stays None: run_consensus_hqs takes `denoise` directly
            # (and clamps internally).
            fista_iters = hqs_iters
            algo_tag = f"consensus_hqs_{args.model}"
            base = cfg_mod.ADMM_L1_DEFAULT  # unused by the HQS path
        elif args.algo == "consensus_d":
            from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

            it, rho = cfg_mod.PNP_L1_DEFAULTS.get(args.model, (50, 0.25))
            base = cfg_mod.ADMMConfig(iter_num=it, rho=rho)
            if args.tuned:
                treg = cfg_mod.TUNED_CONSENSUS_D_CLEAN if args.clean else {}
                entry = treg.get(args.model) or cfg_mod.TUNED_CONSENSUS_D.get(args.model)
                if entry:
                    base = _apply_tuned(base, entry, args)
            cfg0 = _merge_cfg(base, args)
            extra_d = {}
            if args.model_sigma1 is not None:
                extra_d["model_sigma1"] = args.model_sigma1
            denoise = denoiser_mod.build_denoiser(
                args.model,
                weights=denoiser_mod.resolve_weights(args.model, args.weights,
                                                     clean=args.clean),
                iter_num=cfg0.iter_num, x8=args.x8,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                noise_level_model=denoiser_mod.nlm_for_model(args.model, args.nlm),
                **extra_d,
                **_arch_overrides(args),
            )
            z_prox = lambda v, i: jnp.clip(denoise(v, i), 0.0, 1.0)
            algo_tag = f"consensus_d_{args.model}"
        else:
            base = cfg_mod.ADMM_L1_DEFAULT
        cfg = _merge_cfg(base, args)
        dtp = jnp.float64 if args.f64 else jnp.float32
        cdt = jnp.complex128 if args.f64 else jnp.complex64

        import time as _time

        t0 = _time.perf_counter()
        from pnp_admm_cnc_mri_tpu.cli.experiments import _device_complex

        # one BATCHED solve for the whole testset (round 4): the
        # observation axis is -3, so (B, N, H, W) runs as a single
        # program — B×N images per iteration fill the chip instead of B
        # sequential 3-observation dispatches
        ys_all = (np.fft.fft2(imgs01, axes=(-2, -1))[:, None] * all_masks
                  + kn)
        ys_d = _device_complex(ys_all, cdt, dtp)
        if args.algo == "consensus_fista_d":
            z = consensus.run_consensus_fista(
                ys_d, jnp.asarray(all_masks, dtp), fista_iters,
                # consensus z_prox is (v, i); fista prox_fn is (i, u)
                lambda i, u: z_prox(u, i),
                step=_resolve_step(args), dtype=dtp,
            )
        elif args.algo == "consensus_hqs_d":
            z = consensus.run_consensus_hqs(
                ys_d, jnp.asarray(all_masks, dtp), hqs_iters, denoise,
                sigma255=hqs_sigma255, model_sigma1=hqs_ms1,
                model_sigma2=hqs_ms2, dtype=dtp,
            )
        else:
            z, _ = consensus.run_consensus(
                ys_d, jnp.asarray(all_masks, dtp), cfg, z_prox=z_prox,
                dtype=dtp
            )
        zs = np.asarray(z)
        out = score_and_log(
            zs, truth, names,
            f"{args.testset}_dn_{algo_tag}_all_masks", args.results_dir,
            not args.no_save,
        )
        out["wall_s"] = _time.perf_counter() - t0
        out["images"] = len(names)
        out["iters"] = fista_iters or cfg.iter_num
    elif args.algo in ("pnp_sr", "pnp_deblur"):
        runner = experiments.run_sr if args.algo == "pnp_sr" else experiments.run_deblur
        extra = (
            {"sf": args.sf} if args.algo == "pnp_sr" else {"kernel": args.kernel}
        )
        if args.noise_sigma is not None:
            extra["noise_sigma255"] = args.noise_sigma
        tuned = {}
        if args.tuned:
            if args.algo == "pnp_sr":
                treg, creg = cfg_mod.TUNED_SR, cfg_mod.TUNED_SR_CLEAN
            else:
                treg, creg = cfg_mod.TUNED_DEBLUR, cfg_mod.TUNED_DEBLUR_CLEAN
            tuned = (creg.get(args.model) if args.clean else None) \
                or treg.get(args.model, {})
        out = runner(
            model_name=args.model,
            iter_num=args.iter_num or tuned.get("iter_num", 8),
            nlm=args.nlm if args.nlm is not None else tuned.get("nlm"),
            testset=args.testset,
            **extra,
            testsets_dir=args.testsets_dir,
            results_dir=args.results_dir,
            save_images=not args.no_save,
            weights=args.weights,
            x8=args.x8,
            model_sigma1=(args.model_sigma1 if args.model_sigma1 is not None
                          else tuned.get("model_sigma1")),
            bf16=args.bf16,
            clean=args.clean,
            only=args.images,
        )
    elif args.algo in ("fista_l1", "pgd_l1"):
        momentum = args.algo == "fista_l1"
        tuned = cfg_mod.TUNED_PGD_L1 if (args.tuned and not momentum) else {}
        out = experiments.run_fista_l1(
            iter_num=args.iter_num or tuned.get("iter_num", 50),
            lam=args.lam if args.lam is not None else tuned.get("lam", 1e-4),
            step=_resolve_step(args, tuned),
            momentum=momentum, dtype=dtype, **common,
        )
    elif args.algo in ("pnp_fista_d", "pnp_pgd_d"):
        from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

        reg = (cfg_mod.TUNED_FISTA_D if args.algo == "pnp_fista_d"
               else cfg_mod.TUNED_PGD_D)
        tuned = reg.get(args.model, {}) if args.tuned else {}
        it = args.iter_num or tuned.get("iter_num", 30)
        x8 = args.x8 or (not args.no_x8 and tuned.get("x8", False))
        nlm = args.nlm if args.nlm is not None else tuned.get("nlm")
        if args.model == "bm3d":
            # weight-free BM3D prox (leakage-immune); --nlm is the BM3D
            # sigma on the [0,255] scale, like the pnp_*_bm3d pipelines
            from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

            _warn_bm3d_ignored(args)
            denoise = bm3d_prior.make_bm3d_denoiser(
                noise_var=((nlm if nlm is not None else 15.0) / 255.0) ** 2
            )
        else:
            ms1 = (args.model_sigma1 if args.model_sigma1 is not None
                   else tuned.get("model_sigma1"))
            extra = {"model_sigma1": ms1} if ms1 is not None else {}
            denoise = denoiser_mod.build_denoiser(
                args.model,
                weights=denoiser_mod.resolve_weights(args.model, args.weights,
                                                     clean=args.clean),
                iter_num=it, x8=x8,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                noise_level_model=denoiser_mod.nlm_for_model(args.model, nlm),
                **extra,
                **_arch_overrides(args),
            )
        tag = "pnp_fista" if args.algo == "pnp_fista_d" else "pnp_pgd"
        out = experiments.run_pnp_fista(
            denoise, it, step=_resolve_step(args, tuned), dtype=dtype,
            momentum=args.algo == "pnp_fista_d",
            result_tag=f"{tag}_{args.model}", **common,
        )
    elif args.algo == "pnp_pgd_cnc":
        from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

        tuned = cfg_mod.TUNED_PGD_CNC.get(args.model, {}) if args.tuned else {}
        it = args.iter_num or tuned.get("iter_num", 30)
        x8 = args.x8 or (not args.no_x8 and tuned.get("x8", False))
        nlm = args.nlm if args.nlm is not None else tuned.get("nlm")
        alpha = args.alpha if args.alpha is not None else tuned.get("alpha", 1.2)
        lam = args.lam if args.lam is not None else tuned.get("lam", 0.02)
        b = args.b if args.b is not None else tuned.get("b", 36.0)
        if args.model == "bm3d":
            from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

            _warn_bm3d_ignored(args)
            denoise = bm3d_prior.make_bm3d_denoiser(
                noise_var=((nlm if nlm is not None else 15.0) / 255.0) ** 2
            )
            denoise2 = None
        else:
            ms1 = (args.model_sigma1 if args.model_sigma1 is not None
                   else tuned.get("model_sigma1"))
            extra = {"model_sigma1": ms1} if ms1 is not None else {}

            def _build(name, weights):
                return denoiser_mod.build_denoiser(
                    name,
                    weights=denoiser_mod.resolve_weights(name, weights,
                                                         clean=args.clean),
                    iter_num=it, x8=x8,
                    compute_dtype=jnp.bfloat16 if args.bf16 else None,
                    noise_level_model=denoiser_mod.nlm_for_model(name, nlm),
                    **extra,
                    **_arch_overrides(args),
                )

            denoise = _build(args.model, args.weights)
            denoise2 = (_build(args.model2, args.weights2)
                        if args.model2 else None)
        out = experiments.run_pnp_pgd_cnc(
            denoise, it, denoise2=denoise2, alpha=alpha, lam=lam, b=b,
            step=_resolve_step(args, tuned), dtype=dtype,
            result_tag=f"pnp_pgd_cnc_{args.model}", **common,
        )
    elif args.algo == "pnp_hqs_d":
        from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

        tuned = cfg_mod.TUNED_HQS_D.get(args.model, {}) if args.tuned else {}
        it = args.iter_num or tuned.get("iter_num", 30)
        x8 = args.x8 or (not args.no_x8 and tuned.get("x8", False))
        nlm = args.nlm if args.nlm is not None else tuned.get("nlm")
        sigma255 = (args.noise_sigma if args.noise_sigma is not None
                    else tuned.get("sigma255", 10.0))
        ms1 = (args.model_sigma1 if args.model_sigma1 is not None
               else tuned.get("model_sigma1", 49.0))
        ms2 = nlm if nlm is not None else 15.0
        if args.model == "bm3d":
            # ladder-driven BM3D prox (sigma_k decays with the ladder, like
            # the restoration pipelines' _restoration_prior bm3d branch)
            from pnp_admm_cnc_mri_tpu.ops import schedules as schedules_mod
            from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

            _warn_bm3d_ignored(args)
            _, sigmas = schedules_mod.get_rho_sigma(
                sigma=sigma255 / 255.0, iter_num=it,
                model_sigma1=ms1, model_sigma2=ms2)
            denoise = bm3d_prior.make_bm3d_ladder_denoiser(sigmas)
        else:
            denoise = denoiser_mod.build_denoiser(
                args.model,
                weights=denoiser_mod.resolve_weights(args.model, args.weights,
                                                     clean=args.clean),
                iter_num=it, x8=x8,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                noise_level_model=denoiser_mod.nlm_for_model(args.model, nlm),
                model_sigma1=ms1,
                **_arch_overrides(args),
            )
        out = experiments.run_pnp_hqs(
            denoise, it, sigma255=sigma255, model_sigma1=ms1,
            model_sigma2=ms2, dtype=dtype,
            result_tag=f"pnp_hqs_{args.model}", **common,
        )
    elif args.algo == "red_d":
        from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

        tuned = cfg_mod.TUNED_RED_D.get(args.model, {}) if args.tuned else {}
        it = args.iter_num or tuned.get("iter_num", 50)
        lam = args.lam if args.lam is not None else tuned.get("lam", 0.3)
        x8 = args.x8 or (not args.no_x8 and tuned.get("x8", False))
        nlm = args.nlm if args.nlm is not None else tuned.get("nlm")
        if args.model == "bm3d":
            from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

            _warn_bm3d_ignored(args)
            denoise = bm3d_prior.make_bm3d_denoiser(
                noise_var=((nlm if nlm is not None else 15.0) / 255.0) ** 2
            )
        else:
            # RED uses a CONSTANT-strength denoiser: flatten the sigma
            # ladder by starting it at the endpoint (model_sigma1 = nlm)
            # unless the user asks for a decaying ladder explicitly.
            ms1 = args.model_sigma1
            if ms1 is None and nlm is not None:
                ms1 = nlm
            extra = {"model_sigma1": ms1} if ms1 is not None else {}
            denoise = denoiser_mod.build_denoiser(
                args.model,
                weights=denoiser_mod.resolve_weights(args.model, args.weights,
                                                     clean=args.clean),
                iter_num=it, x8=x8,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                noise_level_model=denoiser_mod.nlm_for_model(args.model, nlm),
                **extra,
                **_arch_overrides(args),
            )
        out = experiments.run_red(
            denoise, it, lam=lam, step=_resolve_step(args, tuned), variant=args.red_variant,
            dtype=dtype, result_tag=f"red_{args.model}", **common,
        )
    elif args.algo in ("admm_l1", "admm_cnc"):
        base = cfg_mod.ADMM_L1_DEFAULT if args.algo == "admm_l1" else cfg_mod.ADMM_CNC_DEFAULT
        out = experiments.run_classical(
            args.algo, cfg=_merge_cfg(base, args), dtype=dtype, **common
        )
    elif args.algo in ("pnp_l1_bm3d", "pnp_cnc_bm3d"):
        from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

        base = (
            cfg_mod.PNP_L1_BM3D_DEFAULT
            if args.algo == "pnp_l1_bm3d"
            else cfg_mod.PNP_CNC_BM3D_DEFAULT
        )
        if args.tuned:
            base = _apply_tuned(base, cfg_mod.TUNED_BM3D[args.algo], args)
        cfg = _merge_cfg(base, args)
        # --nlm maps to the BM3D sigma on the reference's [0,255] scale
        # (default: the reference's get_experiment_noise var=0.03, i.e.
        # sigma = sqrt(0.03) ~ 44/255).
        if args.nlm is not None:
            denoise = bm3d_prior.make_bm3d_denoiser(
                noise_var=(args.nlm / 255.0) ** 2
            )
        else:
            denoise = bm3d_prior.make_bm3d_denoiser()
        out = experiments.run_pnp(
            denoise,
            cfg,
            scheme="l1" if args.algo == "pnp_l1_bm3d" else "cnc",
            clamp=False,
            result_tag=args.algo,
            dtype=dtype,
            **common,
        )
    else:
        from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

        if args.algo == "pnp_l1_d":
            it, rho = cfg_mod.PNP_L1_DEFAULTS.get(args.model, (50, 0.25))
            base = cfg_mod.ADMMConfig(iter_num=it, rho=rho)
            treg, creg = cfg_mod.TUNED_PNP_L1, cfg_mod.TUNED_PNP_L1_CLEAN
            key = args.model
        else:
            key = "dncnn_pair" if (args.model2 and "dncnn" in args.model) else args.model
            a, it, lam, rho, b = cfg_mod.PNP_CNC_DEFAULTS.get(key, (0.9, 50, 0.2, 0.45, 0.3))
            base = cfg_mod.ADMMConfig(iter_num=it, lam=lam, rho=rho, alpha=a, b=b)
            treg, creg = cfg_mod.TUNED_PNP_CNC, cfg_mod.TUNED_PNP_CNC_CLEAN
        tuned = {}
        if args.tuned:
            tuned = (creg.get(key) if args.clean else None) or treg.get(key, {})
        if tuned:
            base = _apply_tuned(base, tuned, args)
        cfg = _merge_cfg(base, args)

        # reference default: 【3】 runs drunet WITH per-iteration x8 cycling
        # (x8=True survives only the drunet branch); 【6】 (CNC) runs x8=False
        x8 = args.x8 or (args.algo == "pnp_l1_d" and "drunet" in args.model)
        if tuned and not args.x8:
            x8 = tuned.get("x8", x8)
        if args.no_x8:
            x8 = False
        import jax.numpy as _jnp

        cdt = _jnp.bfloat16 if args.bf16 else None

        def _nlm_for(model_name):
            # the flag is on the reference's [0,255] scale for all models
            return denoiser_mod.nlm_for_model(model_name, args.nlm)

        extra = {}
        if args.model_sigma1 is not None:
            extra["model_sigma1"] = args.model_sigma1
        weights = denoiser_mod.resolve_weights(args.model, args.weights,
                                               clean=args.clean)
        denoise = denoiser_mod.build_denoiser(
            args.model, weights=weights, iter_num=cfg.iter_num, x8=x8,
            compute_dtype=cdt, noise_level_model=_nlm_for(args.model), **extra,
            **_arch_overrides(args),
        )
        denoise2 = None
        if args.model2:
            weights2 = denoiser_mod.resolve_weights(args.model2, args.weights2,
                                                    clean=args.clean)
            denoise2 = denoiser_mod.build_denoiser(
                args.model2, weights=weights2, iter_num=cfg.iter_num, x8=x8,
                compute_dtype=cdt, noise_level_model=_nlm_for(args.model2),
                **extra,
                **_arch_overrides(args),
            )
        out = experiments.run_pnp(
            denoise,
            cfg,
            scheme="l1" if args.algo == "pnp_l1_d" else "cnc",
            denoise2=denoise2,
            clamp=True,
            round_uint8=args.algo == "pnp_cnc_d",
            result_tag=f"{args.algo}_{args.model}",
            dtype=dtype,
            **common,
        )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
