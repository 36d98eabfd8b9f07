"""Probe feature_group_count lane-packing for the nc=64 parity CNNs.

VERDICT r4 #6: the reference-parity pipelines (dncnn17 family) are stuck
at ~34% of MXU bf16 peak because nc=64 half-fills the 128-lane systolic
array, and they cannot change nc without breaking parity. Hypothesis to
test: pack TWO images into the channel axis (batch B/2, channels 2x64)
with ``feature_group_count=2`` — per-image math unchanged (groups are
independent), but the conv presents 128 channels to the compiler.

Counter-hypothesis (why it may NOT help): the MXU's contraction dim for
a grouped conv is cin/groups = 64 — exactly the original underfill; the
grouping only relabels the batch. This probe measures which story is
true, plus the control: nc=128 ungrouped (tdnet's lever) as the known
winner.

    python scripts/lane_packing_probe.py --out results/lane_packing_r5.jsonl
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--depth", type=int, default=15)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from pnp_admm_cnc_mri_tpu.utils import flops as flops_mod
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    key = jax.random.PRNGKey(0)

    def rec(**kw):
        kw = {k: (round(v, 4) if isinstance(v, float) else v)
              for k, v in kw.items()}
        print(json.dumps(kw), flush=True)
        if args.out:
            logger_mod.append_record(args.out, kw)

    def stack(x, ws, groups):
        for w in ws:
            x = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.float32)
            # back to the I/O dtype so bf16 stacks stay bf16 end-to-end
            x = jnp.maximum(x, 0.0).astype(w.dtype)
        return x

    def measure(name, b, c, groups, dtype):
        ws = [jnp.asarray(
            0.01 * np.random.default_rng(i).standard_normal(
                (3, 3, c // groups, c)), dtype)
            for i in range(args.depth)]
        x = jax.jit(lambda k: jax.random.uniform(
            k, (b, 256, 256, c), dtype))(key)

        def run(x):
            def body(carry, _):
                return stack(carry, ws, groups), None
            out, _ = lax.scan(body, x, None, length=args.reps)
            return jnp.sum(out[..., :1, :1, :1].astype(jnp.float32))

        fn = jax.jit(run)
        float(np.asarray(fn(x)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fn(x)))
            best = min(best, time.perf_counter() - t0)
        jf = flops_mod.matmul_flops(run, x)
        # images processed per rep: packed runs carry groups images/row
        n_img = b * groups if groups > 1 else b
        rec(config=name, batch=b, channels=c, groups=groups,
            dtype=str(dtype.__name__), ms_per_image_pass=best * 1e3
            / args.reps / n_img,
            achieved_tflops=jf / best / 1e12,
            pct_mxu_bf16=100.0 * jf / best / 197e12)

    for dtype in (jnp.float32, jnp.bfloat16):
        # baseline: the parity shape (nc=64, batch 64)
        measure("nc64_b%d" % args.batch, args.batch, 64, 1, dtype)
        # lane-packed: 2 images through one grouped conv (nc 2x64)
        measure("nc128_g2_b%d" % (args.batch // 2), args.batch // 2,
                128, 2, dtype)
        # 4-way packing
        measure("nc256_g4_b%d" % (args.batch // 4), args.batch // 4,
                256, 4, dtype)
        # control: true nc=128 (the tdnet lever, different math)
        measure("nc128_g1_b%d" % args.batch, args.batch, 128, 1, dtype)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
