"""Drill-down: which BM3D stage de-optimizes under vmap on TPU?

The batch probe measured vmapped BM3D at ~26 image-iters/s vs 40 for the
sequential lax.map path — per-image compute ~1.9x slower under vmap.
Times each sub-stage of ht_stage (matching, grouping, filtering,
aggregation) sequentially (lax.map over B) vs vmapped (B at once).

    python scripts/bm3d_vmap_drill.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.priors.bm3d import core, transforms as tr

B = 4
H = W = 256
p = core.DEFAULT_PROFILE
bs = p.bs_ht
sigma = 0.1


def stage_fns():
    """Per-image closures for each ht_stage phase, taking the image (and
    intermediates) as arguments so both map and vmap drive them."""
    t2f, t2i = tr.transform_pair(bs, p.transform_ht, p.dec_level)
    k2f = jnp.asarray(np.kron(t2f, t2f), jnp.float32)
    nh = H - bs + 1
    ref_i = core._ref_grid(nh, p.step_ht)
    offs = core._offsets(p.search_ht, bs)
    tau = p.tau_match_ht * p.tau_scale * (bs * bs) / (255.0**2)

    def f_blocks(z):
        return core._extract_blocks(z, bs) @ k2f.T

    def f_match(z):
        pos, counts = core._match(z, ref_i, offs, bs, p.max_3d_ht, tau, None)
        return pos, counts

    def f_group(t2b, pos):
        return core._group_coeffs(t2b, pos, W - bs + 1)

    def f_filter(groups, counts):
        return core._tree_filter_ht(groups, counts, p.lambda_thr3d * sigma,
                                    sigma, p.max_3d_ht)

    k2i = jnp.asarray(np.kron(t2i, t2i), jnp.float32)
    window = tr.kaiser_window(bs, p.beta)

    def f_agg(hat, wts, pos):
        return core._aggregate((H, W), hat @ k2i.T, wts, pos, window)

    return f_blocks, f_match, f_group, f_filter, f_agg


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force scalar fetch (axon)
    sums = jax.jit(lambda *a: sum(jnp.sum(jnp.asarray(x, jnp.float32))
                                  for x in jax.tree.leaves(a)))
    float(sums(out))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(sums(fn(*args)))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    f_blocks, f_match, f_group, f_filter, f_agg = stage_fns()
    key = jax.random.PRNGKey(0)
    z = jax.random.uniform(key, (B, H, W), jnp.float32)

    # precompute intermediates per-image (sequential reference path)
    t2b = jax.jit(jax.vmap(f_blocks))(z)
    pos, counts = jax.jit(jax.vmap(f_match))(z)
    groups = jax.jit(jax.vmap(f_group))(t2b, pos)
    hat, wts = jax.jit(jax.vmap(f_filter))(groups, counts)

    rows = []
    for name, fn, args in [
        ("blocks+t2", f_blocks, (z,)),
        ("match", f_match, (z,)),
        ("group", f_group, (t2b, pos)),
        ("filter_ht", f_filter, (groups, counts)),
        ("aggregate", f_agg, (hat, wts, pos)),
    ]:
        seq = jax.jit(lambda *a, _f=fn: jax.lax.map(lambda xs: _f(*xs), a))
        vec = jax.jit(jax.vmap(fn))
        t_seq = timeit(seq, *args)
        t_vec = timeit(vec, *args)
        rows.append((name, t_seq, t_vec))
        print(f"{name:12s} seq {t_seq*1e3:8.2f} ms   vmap {t_vec*1e3:8.2f} ms"
              f"   ratio {t_vec/t_seq:5.2f}", flush=True)


if __name__ == "__main__":
    main()
