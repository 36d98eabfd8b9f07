"""Micro-probe: isolate WHERE the packed DC formulation loses time.

Times 50-iteration scans of three bodies at batch 512 (one jit each,
scalar fetch):
  t_unpacked — matmul_rfft2 -> a*V+c blend -> matmul_irfft2 (129-wide)
  t_packed   — full packed dc (128-wide einsums + unpack/blend/repack)
  t_packed_noglue — packed transforms with a PLAIN elementwise blend
    (mathematically wrong at columns 0; isolates einsum cost from the
    packed blend's flips/column updates)

Usage: python scripts/dc_micro_probe.py [--cpu]
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import fourier

    B, H, W = 512, 256, 256
    ITERS = 50
    P = jax.lax.Precision.HIGH

    def time_one(fn, key):
        f = jax.jit(fn)
        float(f(key))
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            float(f(jax.random.fold_in(key, i)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def mk_inputs(key):
        k1, k2 = jax.random.split(key)
        v = jax.random.uniform(k1, (B, H, W), jnp.float32)
        a = jax.random.uniform(k2, (H, W // 2 + 1), jnp.float32)
        return v, a

    def body_unpacked(key):
        v, a = mk_inputs(key)
        cw, sw = fourier._dft_mats(W, jnp.float32)
        mats = (cw, sw, cw, sw)

        def step(v, _):
            vr, vi = fourier.matmul_rfft2(v, mats)
            out = fourier.matmul_irfft2(a * vr, a * vi, H, W, mats)
            return jnp.abs(out), None

        v, _ = jax.lax.scan(step, v, None, length=ITERS)
        return v.mean()

    def body_packed_noglue(key):
        v, a = mk_inputs(key)
        pm = fourier._packed_dc_mats(H, W, jnp.float32)
        cwf, swf, ch, sh, _, _, cwi, swi = pm
        a128 = a[..., : W // 2]
        ein = functools.partial(jnp.einsum, precision=P)
        whp = W // 2
        wk = jnp.full((whp,), 2.0, jnp.float32).at[0].set(1.0)

        def step(v, _):
            xr = ein("...hw,wk->...hk", v, cwf)
            xi = -ein("...hw,wk->...hk", v, swf)
            yr = ein("mh,...hk->...mk", ch, xr) + ein("mh,...hk->...mk", sh, xi)
            yi = ein("mh,...hk->...mk", ch, xi) - ein("mh,...hk->...mk", sh, xr)
            br, bi = a128 * yr, a128 * yi  # WRONG at col 0 — timing only
            tr = (ein("hm,...hk->...mk", ch, br)
                  - ein("hm,...hk->...mk", sh, bi)) / H
            ti = (ein("hm,...hk->...mk", ch, bi)
                  + ein("hm,...hk->...mk", sh, br)) / H
            out = (ein("...hk,kw->...hw", tr * wk, cwi)
                   - ein("...hk,kw->...hw", ti * wk, swi)) / W
            return jnp.abs(out), None

        v, _ = jax.lax.scan(step, v, None, length=ITERS)
        return v.mean()

    def body_packed(key):
        k1, k2 = jax.random.split(key)
        v = jax.random.uniform(k1, (B, H, W), jnp.float32)
        y = jax.random.uniform(k2, (H, W), jnp.float32).astype(jnp.complex64)
        mask = (jax.random.uniform(k2, (H, W)) < 0.3).astype(jnp.float32)
        old = fourier._MATMUL_PACKED
        fourier._MATMUL_PACKED = True
        try:
            dc = fourier.make_rfft_data_consistency(y, mask, 0.015,
                                                    method="matmul")
        finally:
            fourier._MATMUL_PACKED = old

        def step(v, _):
            return dc(v), None

        v, _ = jax.lax.scan(step, v, None, length=ITERS)
        return v.mean()

    out = {}
    for name, fn in [("unpacked", body_unpacked),
                     ("packed_noglue", body_packed_noglue),
                     ("packed", body_packed)]:
        dt = time_one(fn, jax.random.PRNGKey(0))
        out[name] = {"wall_s": round(dt, 4),
                     "ips": round(B * ITERS / dt, 1)}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
