"""Attribute PnP-CNN pipeline time across conv stack / DC solve / rest.

VERDICT r3 #2: the CNN-prior pipelines sit at 1.4-3.9% of the modeled
speed-of-light while the standalone conv stacks measured 21% (nc=64) /
59% (nc=128) of MXU peak — where do the FLOPs-per-second go inside the
loop?  This probe times, each as a lax.scan of N repetitions inside ONE
jit (amortizing the ~24.5 ms axon dispatch floor, scalar-fetch timed):

  - the denoiser forward alone (tdnet / dncnn17), f32 and bf16
  - the data-consistency solve alone (matmul + fft formulations)
  - the full pnp_admm_l1 iteration (solver + prior)

at batch 8 and 64, 256^2. The difference full - (conv + dc) is the
"rest" (prox/clamp/layout/extrapolation). Run on the TPU:

    python scripts/pnp_attribution_probe.py [--reps 20] [--batch 8,64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def scan_timer(make_body, x0, reps):
    """Time one lax.scan of ``reps`` body applications, scalar-fetched."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, _):
            return make_body(c), None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(out[..., :1, :1].astype(jnp.float32))

    float(run(x0))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--batches", default="8,64")
    p.add_argument("--iter_num", type=int, default=50)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.data import masks as masks_mod
    from pnp_admm_cnc_mri_tpu.ops import fourier
    from pnp_admm_cnc_mri_tpu.priors import denoiser as dn
    from pnp_admm_cnc_mri_tpu.solvers import admm
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    mask = jnp.asarray(np.asarray(masks_mod.load_mask("Q_Random30")),
                       jnp.float32)
    rows = []

    def rec(**kw):
        kw = {k: (round(v, 6) if isinstance(v, float) else v)
              for k, v in kw.items()}
        rows.append(kw)
        print(json.dumps(kw), flush=True)
        if args.out:
            logger_mod.append_record(args.out, kw)

    for b in [int(x) for x in args.batches.split(",")]:
        key = jax.random.PRNGKey(0)
        x = jax.jit(lambda k: jax.random.uniform(
            k, (b, 256, 256), jnp.float32))(key)
        y = jax.jit(lambda u, m: (jnp.fft.fft2(u, axes=(-2, -1)) * m
                                  ).astype(jnp.complex64))(x, mask)

        for name, cdt in (("f32", None), ("bf16", jnp.bfloat16)):
            for model in ("tdnet", "dncnn_15"):
                import warnings

                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    den = dn.build_denoiser(model, iter_num=args.iter_num,
                                            compute_dtype=cdt)
                t = scan_timer(lambda u: den(u, 5).astype(jnp.float32), x,
                               args.reps)
                rec(component=f"denoise_{model}_{name}", batch=b,
                    ms_per_call=t * 1e3,
                    image_iters_per_s=b / t)

        for method in ("matmul", "fft"):
            # build the dc closure INSIDE the jit on traced args — exactly
            # how the solvers use it (the blend-field precompute is then
            # traced, not eager; axon lacks eager flip/roll kernels)
            import functools

            @functools.partial(jax.jit, static_argnames="m_")
            def run_dc(yy, mm, u0, m_=method):
                dc = fourier.make_rfft_data_consistency(yy, mm, 0.15,
                                                        method=m_)

                def body(c, _):
                    return dc(c), None

                out, _ = jax.lax.scan(body, u0, None, length=args.reps)
                return jnp.sum(out[..., :1, :1].astype(jnp.float32))

            float(run_dc(y, mask, x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_dc(y, mask, x))
                best = min(best, time.perf_counter() - t0)
            t = best / args.reps
            rec(component=f"dc_{method}", batch=b, ms_per_call=t * 1e3,
                image_iters_per_s=b / t)

        # full pipelines (one dispatch of iter_num iterations)
        cfg = ADMMConfig(iter_num=args.iter_num, rho=0.15)
        for name, cdt in (("f32", None), ("bf16", jnp.bfloat16)):
            for model in ("tdnet", "dncnn_15"):
                import warnings

                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    den = dn.build_denoiser(model, iter_num=args.iter_num,
                                            compute_dtype=cdt)
                fn = jax.jit(lambda yy, mm, _d=den: admm.pnp_admm_l1(
                    yy, mm, cfg, _d, dtype=jnp.float32)[0].x.mean())
                float(fn(y, mask))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(fn(y, mask))
                    best = min(best, time.perf_counter() - t0)
                rec(component=f"pnp_{model}_{name}", batch=b,
                    ms_per_iter=best / args.iter_num * 1e3,
                    image_iters_per_s=b * args.iter_num / best)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
