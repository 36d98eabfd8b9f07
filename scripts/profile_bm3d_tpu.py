"""Per-stage BM3D timing on the TPU (round-2 throughput push).

Times, each as its own jitted program with a scalar fetch (axon rule):
matching only, HT stage, Wiener stage, full two-stage bm3d, and the
5-iteration PnP-BM3D pipeline — plus the convolve-vs-matmul distance
formulations head-to-head.

    python scripts/profile_bm3d_tpu.py [--cpu] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--stack_filter", choices=["auto", "tree", "matrix"],
                   default="auto",
                   help="A/B the shared-prefix Haar-tree stack filter "
                        "against the per-size einsum loop")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pnp_admm_cnc_mri_tpu.priors.bm3d import core

    if args.stack_filter != "auto":
        core._STACK_FILTER_TREE = args.stack_filter == "tree"

    h = w = args.size
    sigma = 0.1

    # synthesize on device (axon: big host->device transfers stall)
    @jax.jit
    def make(key):
        k1, k2 = jax.random.split(key)
        x = 0.5 + 0.25 * jax.random.uniform(k1, (h, w), jnp.float32)
        return x + sigma * jax.random.normal(k2, (h, w), jnp.float32)

    z = make(jax.random.PRNGKey(0))
    float(z.mean())

    prof = core.DEFAULT_PROFILE
    nh = h - prof.bs_ht + 1
    ref = core._ref_grid(nh, prof.step_ht)
    offs = core._offsets(prof.search_ht, prof.bs_ht)
    tau = prof.tau_match_ht * prof.tau_scale * 64 / 255.0**2

    def timed(fn, *a):
        out = fn(*a)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}

    dist_conv = jax.jit(
        lambda img: core._block_distances(img, ref, offs, prof.bs_ht).sum())
    dist_mm = jax.jit(
        lambda img: core._block_distances_matmul(img, ref, offs, prof.bs_ht).sum())
    results["distances_convolve_s"] = timed(dist_conv, z)
    results["distances_matmul_s"] = timed(dist_mm, z)

    match_fn = jax.jit(
        lambda img: core._match(img, ref, offs, prof.bs_ht,
                                prof.max_3d_ht, tau)[0].sum())
    results["match_total_s"] = timed(match_fn, z)

    ht = jax.jit(lambda img: core.ht_stage(img, jnp.float32(sigma), prof).mean())
    results["ht_stage_s"] = timed(ht, z)

    yb = core.ht_stage(z, jnp.float32(sigma), prof)
    wie = jax.jit(
        lambda img, pil: core.wiener_stage(img, pil, jnp.float32(sigma), prof).mean())
    results["wiener_stage_s"] = timed(wie, z, yb)

    full = jax.jit(lambda img: core.bm3d(img, jnp.float32(sigma), prof).mean())
    results["bm3d_full_s"] = timed(full, z)

    # 5-iteration PnP pipeline (the bench-suite config)
    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.priors import bm3d_prior
    from pnp_admm_cnc_mri_tpu.solvers import admm

    den = bm3d_prior.make_bm3d_denoiser()
    cfg = ADMMConfig(iter_num=5, rho=0.8)

    @jax.jit
    def make_y(key):
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.uniform(k1, (1, h, w), jnp.float32)
        mask = (jax.random.uniform(k2, (h, w)) < 0.3).astype(jnp.float32)
        noise = 3.0 * (jax.random.normal(k3, (h, w))
                       + 1j * jax.random.normal(jax.random.fold_in(k3, 1),
                                                (h, w))).astype(jnp.complex64)
        y = (jnp.fft.fft2(img, axes=(-2, -1)) * mask + noise).astype(jnp.complex64)
        return y, mask

    y, m = make_y(jax.random.PRNGKey(1))
    float(m.sum())
    pnp = jax.jit(
        lambda y, m: admm.pnp_admm_l1(y, m, cfg, den, clamp=False,
                                      dtype=jnp.float32)[0].x.mean())
    dt = timed(pnp, y, m)
    results["pnp_bm3d_5it_s"] = dt
    results["pnp_bm3d_image_iters_per_s"] = 5.0 / dt
    results["backend"] = jax.default_backend()
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
