"""Canvas-packed BM3D economics (VERDICT r3 #7): measure, then decide.

The proposal: pack B 256^2 images into one guarded mosaic so the
EXISTING single-image kernel amortizes the ~24.5 ms axon dispatch floor
in one call. Two structural facts cap it before any measurement:

1. **Bit-identity is impossible without core changes**: the reference
   grid force-includes the last row/col position per image
   (``core._ref_grid``; position 248 for 256px, which is not on the
   global stride-3 lattice of a packed canvas), and guard-origin
   reference blocks overlap image borders at aggregation time (their
   garbage-filtered patches scatter INTO the outer ~7 px of every
   image).
2. **The floor is already amortized**: the `_steady` scan (4 solves per
   dispatch) sustains ~54 image-iters/s; a canvas only helps against
   the UNAMORTIZED one-image-per-dispatch mode.

What remains open is the area-scaling term: a 2x4 canvas at pitch 288
(guard 32 >= the 27-px search+block reach, pitch % step == 0) is
544x1120 = 1.16x the pixels of 8 separate 256^2 images. This probe
measures core.bm3d wall time at 256^2, 512^2 and 544x1120 (scan-
amortized, scalar-fetched) so the canvas throughput bound

    B / (t_canvas + floor)   vs   steady-scan and single-dispatch rates

is a measured number. Run on the TPU:

    python scripts/bm3d_canvas_probe.py [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.priors.bm3d import core
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    sigma = float(np.sqrt(0.03))
    shapes = [(256, 256), (512, 512), (544, 1120)]
    rows = []
    for h, w in shapes:
        x = jax.jit(lambda k: jax.random.uniform(k, (h, w), jnp.float32))(
            jax.random.PRNGKey(0))

        @jax.jit
        def run(u):
            def body(c, _):
                return core.bm3d(c, sigma), None

            out, _ = jax.lax.scan(body, u, None, length=args.reps)
            return jnp.sum(out[:1, :1])

        t0 = time.perf_counter()
        float(run(x))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, time.perf_counter() - t0)
        t = best / args.reps
        row = {"shape": f"{h}x{w}", "ms_per_call": round(t * 1e3, 2),
               "px_ratio_vs_256": round(h * w / 65536.0, 3),
               "time_ratio_vs_256": (round(t * 1e3 / rows[0]["ms_per_call"], 3)
                                     if rows else 1.0),
               "compile_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            logger_mod.append_record(args.out, row)

    t1 = rows[0]["ms_per_call"]
    tc = rows[-1]["ms_per_call"]
    floor = 24.5
    verdict = {
        "canvas8_rate_bound": round(8.0 / ((tc + floor) / 1e3), 1),
        "single_dispatch_rate": round(1.0 / ((t1 + floor) / 1e3), 1),
        "note": "steady-scan (4 solves/dispatch) sustains ~54 img/s; "
                "canvas must beat 2x the single-dispatch rate to land",
    }
    print(json.dumps(verdict))
    if args.out:
        logger_mod.append_record(args.out, verdict)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
