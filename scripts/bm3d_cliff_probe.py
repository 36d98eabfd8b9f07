"""Name BM3D's superlinear area-scaling cliff (VERDICT r4 #5).

Round 4 measured 256^2 -> 512^2 as 4x the pixels but 11.6x the time
(41.4 -> 478.8 ms) while 544x1120 (9.3x px) costs the SAME ~480 ms —
shape-cliff behavior, mechanism unnamed. This probe uses the round-5
device profiler to name the op: trace one ht_stage at 256^2 and one at
512^2, classify device time per op, and report which class scales
superlinearly. Also walks the intermediate sizes (256, 320, 384, 448,
512) so the cliff edge is located, and checks the prime suspects'
analytic scaling:

- block matching: O^2 offset loop x R^2 field — R grows ~linear in side
  so the (O^2, R, R) distance volume grows ~area; NOT superlinear.
- top_k / approx_max_k over G = R^2 groups: linear in area.
- aggregation scatter (G*K rows into an (nh*nw, 65) canvas): linear.
- XLA tiling cliffs: a (R, R) einsum output with R = 505 pads to
  (512, 512) lanes — benign; but lax.map chunking (batch_size=128 in
  _block_distances_matmul) re-materializes the padded zp image per
  chunk...

    python scripts/bm3d_cliff_probe.py --out results/bm3d_cliff_r5.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def classify(op_name: str) -> str:
    s = op_name.lower()
    if "sort" in s or "top-k" in s or "topk" in s or "approx" in s:
        return "topk/sort"
    if "scatter" in s:
        return "scatter"
    if "gather" in s or "dynamic-slice" in s:
        return "gather/slice"
    if "dot" in s:
        return "dot"
    if "conv" in s:
        return "conv"
    if "copy" in s or "transpose" in s or "bitcast" in s:
        return "layout"
    if "fusion" in s:
        return "fusion"
    if "while" in s or "jit_" in s or "tuple" in s:
        return "control"
    return "other"


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="256,320,384,448,512")
    p.add_argument("--trace_sizes", default="256,512")
    p.add_argument("--out", default=None)
    p.add_argument("--trace_dir", default="/tmp/bm3d_cliff_trace")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.priors.bm3d import core
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    prof = core.BM3DProfile()
    sigma = 0.1

    def rec(**kw):
        print(json.dumps(kw)[:2000], flush=True)
        if args.out:
            logger_mod.append_record(args.out, kw)

    trace_sizes = {int(s) for s in args.trace_sizes.split(",")}
    for n in [int(s) for s in args.sizes.split(",")]:
        key = jax.random.PRNGKey(n)
        z = jax.jit(lambda k: jax.random.uniform(
            k, (n, n), jnp.float32))(key)

        run = jax.jit(lambda u: core.ht_stage(u, sigma, prof).mean())
        float(np.asarray(run(z)))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(run(z)))
            best = min(best, time.perf_counter() - t0)
        row = {"n": n, "ms": round(best * 1e3, 2),
               "ms_per_mpx": round(best * 1e3 / (n * n / 1e6), 2)}

        if n in trace_sizes and jax.default_backend() != "cpu":
            tdir = os.path.join(args.trace_dir, str(n))
            jax.profiler.start_trace(tdir)
            float(np.asarray(run(z)))
            jax.profiler.stop_trace()
            from profile_arbitration import _parse_xplane_top_ops

            pr, err = _parse_xplane_top_ops(tdir, top=300)
            if pr:
                classes = {}
                for o in pr["top_ops"]:
                    cls = classify(o["op"])
                    if cls == "control":
                        continue
                    classes[cls] = classes.get(cls, 0.0) + o["s"]
                row["op_class_seconds"] = {
                    k: round(v, 5) for k, v in
                    sorted(classes.items(), key=lambda kv: -kv[1])}
                row["top5"] = [{"op": o["op"][:120], "s": o["s"]}
                               for o in pr["top_ops"][:5]]
            else:
                row["profile_error"] = err
        rec(**row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
