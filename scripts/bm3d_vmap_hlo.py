"""Name the intermediate behind the vmap-BM3D memory blow-up (VERDICT r3 #8).

Round 3 measured the symptom: the vmapped BM3D lowering models 5,804
MB/image-iter of traffic vs 656 sequential (results/bench_tpu.jsonl
pnp_bm3d_5it_b4) and runs ~1.9x slower per image. This script compiles
the sequential (chunk=1 lax.map) and vmapped (chunk=4) denoiser on the
TPU and reports, per variant: XLA cost-analysis aggregates and the
largest tensors in the optimized HLO (shape, producer op) so the
offending materialization can be named in docs/PERF.md.

    python scripts/bm3d_vmap_hlo.py [--chunk 4] [--cpu]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")


BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
         "s8": 1, "u8": 1, "c64": 8, "f64": 8, "s64": 8}


def tensor_sizes(hlo_text: str):
    """(size_bytes, shape_str, opcode, name) for every instruction with an
    array result in an optimized HLO dump."""
    out = []
    # e.g.:  %name = f32[4,6889,16,64]{...} scatter(...)
    pat = re.compile(r"%?([\w.\-]+) = ([a-z0-9]+)\[([\d,]*)\][^ ]* ([a-z\-]+)\(")
    for m in pat.finditer(hlo_text):
        name, dt, dims, op = m.groups()
        if dt not in BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append((n * BYTES[dt], f"{dt}[{dims}]", op, name))
    out.sort(reverse=True)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

    x = jnp.zeros((args.chunk, 256, 256), jnp.float32)
    for name, chunk in (("sequential", 1), (f"vmap{args.chunk}", args.chunk)):
        d = bm3d_prior.make_bm3d_denoiser(noise_var=(15 / 255.0) ** 2,
                                          batch_chunk=chunk)
        comp = jax.jit(lambda u: d(u, 0)).lower(x).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ma = comp.memory_analysis()
        print(f"== {name}: bytes_accessed={ca.get('bytes accessed', 0)/1e9:.2f} GB "
              f"flops={ca.get('flops', 0)/1e9:.2f} G "
              f"temp={ma.temp_size_in_bytes/1e6:.0f} MB "
              f"(batch {args.chunk}, one denoise call)")
        text = comp.as_text()
        for size, shape, op, iname in tensor_sizes(text)[: args.top]:
            print(f"   {size/1e6:9.1f} MB  {op:<12} {shape}  {iname[:60]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
