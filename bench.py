"""Benchmark harness: batched ADMM iteration throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's sequential NumPy ADMM-L1 loop runs ~180
iterations/s on one 256x256 image (BASELINE.md, derived from
``results/Set1_dn_ADMM_L1/*.log`` timestamps). Here the same math runs as a
single jitted ``lax.scan`` over a batch of images, so the unit of
throughput is image-iterations/s (batch x iterations / wall-clock).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BASELINE_ITERS_PER_S = 180.0  # reference CPU ADMM-L1, 1 image (BASELINE.md)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.data import masks, noise
    from pnp_admm_cnc_mri_tpu.solvers import admm

    batch = 256
    iter_num = 50
    shape = (256, 256)

    try:
        mask = masks.load_mask("Q_Random30")
        kn = noise.load_noise()
    except Exception:
        mask = masks.random_mask(shape, 0.3, seed=0)
        kn = noise.synth_noise(shape, std=10.0, seed=0)

    rng = np.random.default_rng(0)
    imgs = rng.random((batch, *shape))
    y = (np.fft.fft2(imgs, axes=(-2, -1)) * mask + kn).astype(np.complex64)

    y_d = jnp.asarray(y)
    mask_d = jnp.asarray(mask, dtype=jnp.float32)
    cfg = ADMMConfig(iter_num=iter_num, lam=0.1, rho=0.015)

    @jax.jit
    def solve(y):
        final, _ = admm.admm_l1(y, mask_d, cfg, dtype=jnp.float32)
        return final.x

    # Warmup / compile
    solve(y_d).block_until_ready()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        solve(y_d).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    image_iters_per_s = batch * iter_num / dt
    print(
        json.dumps(
            {
                "metric": "admm_l1_image_iterations_per_s_1chip",
                "value": round(image_iters_per_s, 1),
                "unit": "image-iters/s (256x256, batch=256, 50 iters)",
                "vs_baseline": round(image_iters_per_s / BASELINE_ITERS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
