"""Attribute the classical ADMM-L1 headline's missing 3.3x (VERDICT r4 #8).

bench.py's headline (97k image-iters/s) sits at ~30% of its modeled
compute bound with the binding resource unnamed. Round 5's working
device profiler (see scripts/profile_arbitration.py: jax.profiler traces
DO work through the axon tunnel; xplane parsed via the TF tsl proto)
makes the attribution direct: trace the exact bench program (batch 512,
50-iteration fused scan, DFT-as-matmul DC) and split device time across
op classes — DC einsums / FFT ops / pointwise prox chain / layout
(copy/transpose) / other.

    python scripts/classical_attribution.py --out results/classical_attr_r5.jsonl
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def classify(op_name: str) -> str:
    s = op_name.lower()
    if "conv" in s:
        return "conv"
    if "dot" in s or "einsum" in s or re.search(r"%fusion.*dot", s):
        return "dot"
    if "fft" in s:
        return "fft"
    if "copy" in s or "transpose" in s or "bitcast" in s or "reshape" in s:
        return "layout"
    if "fusion" in s:
        return "fusion(elementwise)"
    if "while" in s or "jit_" in s or "tuple" in s or "get-tuple" in s:
        return "control"
    return "other"


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--out", default=None)
    p.add_argument("--trace_dir", default="/tmp/classical_trace")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.solvers import admm
    from pnp_admm_cnc_mri_tpu.utils import flops as flops_mod
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    cfg = ADMMConfig(iter_num=args.iters, lam=0.1, rho=0.015)
    h = w = 256

    @functools.partial(jax.jit, static_argnames=("b",))
    def make_and_solve(key, b):
        k1, k2, k3 = jax.random.split(key, 3)
        imgs = jax.random.uniform(k1, (b, h, w), jnp.float32)
        mask = (jax.random.uniform(k2, (h, w)) < 0.3).astype(jnp.float32)
        noise = 3.0 * (
            jax.random.normal(k3, (h, w))
            + 1j * jax.random.normal(jax.random.fold_in(k3, 1), (h, w))
        ).astype(jnp.complex64)
        y = (jnp.fft.fft2(imgs, axes=(-2, -1)) * mask + noise).astype(
            jnp.complex64)
        final, _ = admm.admm_l1(y, mask, cfg, dtype=jnp.float32,
                                dc_method="matmul", fused=False)
        return jnp.mean(final.x)

    key = jax.random.PRNGKey(0)
    float(make_and_solve(key, b=args.batch))  # compile + warm
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(make_and_solve(jax.random.PRNGKey(i + 1), b=args.batch))
        best = min(best, time.perf_counter() - t0)
    ips = args.batch * args.iters / best

    jflops = flops_mod.matmul_flops(
        lambda k: make_and_solve(k, b=args.batch), key)

    jax.profiler.start_trace(args.trace_dir)
    float(make_and_solve(jax.random.PRNGKey(99), b=args.batch))
    jax.profiler.stop_trace()

    from profile_arbitration import _parse_xplane_top_ops

    prof, err = _parse_xplane_top_ops(args.trace_dir, top=200)
    row = {
        "batch": args.batch, "iters": args.iters,
        "image_iters_per_s": round(ips, 1),
        "wall_s": round(best, 4),
        "jaxpr_gflop_total": round(jflops / 1e9, 1),
        "achieved_tflops": round(jflops / best / 1e12, 1),
    }
    if prof:
        classes = {}
        # skip the outermost wrappers (they double-count their children)
        for o in prof["top_ops"]:
            cls = classify(o["op"])
            if cls == "control":
                continue
            classes[cls] = classes.get(cls, 0.0) + o["s"]
        tot = sum(classes.values())
        row["op_class_seconds"] = {k: round(v, 5)
                                  for k, v in sorted(classes.items(),
                                                     key=lambda kv: -kv[1])}
        row["op_class_pct"] = {k: round(100 * v / tot, 1)
                               for k, v in classes.items()}
        row["top_ops"] = [
            {"op": o["op"][:160], "s": o["s"], "pct": o["pct"]}
            for o in prof["top_ops"][:20]]
    else:
        row["profile_error"] = err
    print(json.dumps(row, indent=1)[:4000])
    if args.out:
        logger_mod.append_record(args.out, row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
