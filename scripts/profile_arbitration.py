"""Arbitrate the round-4 MXU telemetry contradiction with real evidence.

Two instruments disagreed ~50x on pnp_tdnet_b64's MXU utilization:

  A. cli_bench_suite's ``pct_mxu_bf16`` = XLA ``cost_analysis()`` flops
     / 197 TF/s -> 1.7% (0.972 GFLOP/image-iter)
  B. scripts/pnp_attribution_probe.py's hand conv count -> 84-87% of
     peak (~49 GFLOP/image-iter)

This script settles it three ways on the live chip:

  1. **Analytical jaxpr count** (``utils/flops.matmul_flops``): exact
     conv/dot FLOPs from traced operand shapes, backend-independent.
  2. **cost_analysis()** on the same compiled executable.
  3. **A jax.profiler device trace** of the same program, parsed from
     the xplane proto: where device time actually goes (conv fusions vs
     everything else).

Each row records wall time per image-iteration (scan-amortized, scalar-
fetched) and the achieved TF/s under both flop counts, so the wrong
instrument is identified by internal consistency: the analytical count
is exact by construction, and the profile shows whether the measured
wall is conv-dominated at that rate.

    python scripts/profile_arbitration.py --out results/mxu_arbitration_r5.jsonl
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12  # v5e MXU bf16 peak (pallas guide)


def _parse_xplane_top_ops(logdir: str, top: int = 12):
    """Best-effort op-level device times from the newest xplane trace."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None, "no xplane.pb produced"
    path = paths[-1]
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover
        return None, f"xplane proto unavailable: {e}"
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    ops = {}
    total = 0.0
    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e12
                ops[name] = ops.get(name, 0.0) + dur
                total += dur
    if not ops:
        return None, f"no device planes in {path}"
    ranked = sorted(ops.items(), key=lambda kv: -kv[1])[:top]
    return {"trace_path": path, "device_total_s": total,
            "top_ops": [{"op": k, "s": round(v, 6),
                         "pct": round(100 * v / total, 1)}
                        for k, v in ranked]}, None


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--models", default="tdnet,dncnn_15")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument("--trace_dir", default="/tmp/mxu_trace")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.data import masks as masks_mod
    from pnp_admm_cnc_mri_tpu.priors import denoiser as dn
    from pnp_admm_cnc_mri_tpu.utils import flops as flops_mod
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    mask = jnp.asarray(np.asarray(masks_mod.load_mask("Q_Random30")),
                       jnp.float32)
    b = args.batch
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.uniform(
        k, (b, 256, 256), jnp.float32))(key)

    def rec(**kw):
        kw = {k: (round(v, 6) if isinstance(v, float) else v)
              for k, v in kw.items()}
        print(json.dumps(kw), flush=True)
        if args.out:
            logger_mod.append_record(args.out, kw)

    import warnings

    for model in args.models.split(","):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            den = dn.build_denoiser(model, iter_num=50,
                                    compute_dtype=jnp.bfloat16)

        def make(reps):
            def run(u):
                def body(c, _):
                    return den(c, 5).astype(jnp.float32), None
                out, _ = jax.lax.scan(body, u, None, length=reps)
                return jnp.sum(out[..., :1, :1])
            return run

        run = jax.jit(make(args.reps))
        lowered = run.lower(x)
        compiled = lowered.compile()
        ca = {}
        try:
            c = compiled.cost_analysis()
            if isinstance(c, list):
                c = c[0]
            ca = {"flops": float(c.get("flops", 0.0)),
                  "bytes": float(c.get("bytes accessed", 0.0))}
        except Exception as e:
            ca = {"error": str(e)}

        jaxpr_flops = flops_mod.matmul_flops(make(args.reps), x)

        float(np.asarray(compiled(x)))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(compiled(x)))
            best = min(best, time.perf_counter() - t0)
        per_call = best / args.reps
        n_calls = b * args.reps

        row = dict(
            model=model, batch=b, reps=args.reps,
            backend=jax.default_backend(),
            ms_per_call=per_call * 1e3,
            jaxpr_gflop_per_image_call=jaxpr_flops / n_calls / 1e9,
            cost_analysis_gflop_per_image_call=(
                ca.get("flops", float("nan")) / n_calls / 1e9
                if "flops" in ca else None),
            achieved_tflops_jaxpr=jaxpr_flops / best / 1e12,
            pct_mxu_bf16_jaxpr=100.0 * jaxpr_flops / best / PEAK_BF16,
        )
        if "flops" in ca:
            row["achieved_tflops_cost_analysis"] = (
                ca["flops"] / best / 1e12)
            row["undercount_factor"] = (
                jaxpr_flops / ca["flops"] if ca["flops"] else None)
        rec(**row)

        # device trace of ONE dispatch (short scan to keep the trace small)
        if jax.default_backend() != "cpu" and model == "tdnet":
            short = jax.jit(make(5))
            float(np.asarray(short(x)))
            try:
                jax.profiler.start_trace(args.trace_dir)
                float(np.asarray(short(x)))
                jax.profiler.stop_trace()
                prof, err = _parse_xplane_top_ops(args.trace_dir)
                if prof:
                    rec(model=model, kind="device_profile", **prof)
                else:
                    rec(model=model, kind="device_profile_failed", error=err)
            except Exception as e:
                rec(model=model, kind="device_profile_failed", error=str(e))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
