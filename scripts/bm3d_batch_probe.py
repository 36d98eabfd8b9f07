"""Probe: BM3D-prior PnP throughput vs batch size / vmap chunk on TPU.

VERDICT r2 #3: every BM3D perf number was batch 1 (lax.map serialized the
batch on device); the ~24.5 ms axon dispatch floor amortizes over a
batch. Measures pnp_admm_l1+BM3D image-iters/s for (batch, chunk) combos.

    python scripts/bm3d_batch_probe.py [--cpu] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--combos", default="1:1,4:4,8:4,8:8,16:8")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.data import masks, noise
    from pnp_admm_cnc_mri_tpu.priors import bm3d_prior
    from pnp_admm_cnc_mri_tpu.solvers import admm

    mask = masks.load_mask("Q_Random30")
    kn = noise.load_noise()
    m = jnp.asarray(mask, jnp.float32)

    @jax.jit
    def synth(key, m_host, kn_re, kn_im):
        imgs = jax.random.uniform(key, (16, 256, 256), jnp.float32)
        kn_dev = kn_re + 1j * kn_im
        return (jnp.fft.fft2(imgs, axes=(-2, -1)) * m_host + kn_dev).astype(
            jnp.complex64)

    y_all = synth(jax.random.PRNGKey(0), m,
                  jnp.asarray(np.real(kn), jnp.float32),
                  jnp.asarray(np.imag(kn), jnp.float32))

    cfg = ADMMConfig(iter_num=args.iters, rho=0.8)

    for combo in args.combos.split(","):
        batch, chunk = map(int, combo.split(":"))
        den = bm3d_prior.make_bm3d_denoiser(batch_chunk=chunk)
        fn = jax.jit(
            lambda y, m: admm.pnp_admm_l1(y, m, cfg, den, clamp=False,
                                          dtype=jnp.float32)[0].x.mean()
        )
        yb = y_all[:batch]
        t0 = time.perf_counter()
        float(fn(yb, m))  # compile
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(yb, m))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(json.dumps({
            "batch": batch, "chunk": chunk,
            "image_iters_per_s": round(batch * args.iters / dt, 1),
            "wall_s": round(dt, 4), "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
