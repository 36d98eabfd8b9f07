"""Benchmark harness: batched ADMM iteration throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's sequential NumPy ADMM-L1 loop runs ~180
iterations/s on one 256x256 image (BASELINE.md, from
``results/Set1_dn_ADMM_L1/*.log`` timestamps). Here the same math runs as a
single jitted ``lax.scan`` over a batch of images, so throughput is
image-iterations/s (batch x iterations / wall-clock).

Axon-backend hardening (the TPU is reached through an experimental
tunnel): timing forces a host fetch of a reduced scalar (block_until_ready
alone does not reliably block there), device arrays are passed as jit
arguments (closed-over constants hit an UNIMPLEMENTED device->host path),
and transient backend errors trigger retries with a smaller batch.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BASELINE_ITERS_PER_S = 180.0  # reference CPU ADMM-L1, 1 image (BASELINE.md)
ITER_NUM = 50
SHAPE = (256, 256)


def _run_once(batch: int) -> float:
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.data import masks, noise
    from pnp_admm_cnc_mri_tpu.solvers import admm

    try:
        mask = masks.load_mask("Q_Random30")
        kn = noise.load_noise()
    except Exception:
        mask = masks.random_mask(SHAPE, 0.3, seed=0)
        kn = noise.synth_noise(SHAPE, std=10.0, seed=0)

    rng = np.random.default_rng(0)
    imgs = rng.random((batch, *SHAPE))
    y = (np.fft.fft2(imgs, axes=(-2, -1)) * mask + kn).astype(np.complex64)

    y_d = jnp.asarray(y)
    mask_d = jnp.asarray(mask, dtype=jnp.float32)
    cfg = ADMMConfig(iter_num=ITER_NUM, lam=0.1, rho=0.015)

    @jax.jit
    def solve(y, m):
        final, _ = admm.admm_l1(y, m, cfg, dtype=jnp.float32)
        # Reduce on device; fetching this scalar forces full execution.
        return jnp.mean(final.x), jnp.max(final.x)

    float(solve(y_d, mask_d)[0])  # compile + warmup

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(solve(y_d, mask_d)[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch * ITER_NUM / dt


def main() -> None:
    last_err = None
    for batch in (256, 128, 64, 32):
        for attempt in range(2):
            try:
                ips = _run_once(batch)
                print(
                    json.dumps(
                        {
                            "metric": "admm_l1_image_iterations_per_s_1chip",
                            "value": round(ips, 1),
                            "unit": f"image-iters/s (256x256, batch={batch}, {ITER_NUM} iters)",
                            "vs_baseline": round(ips / BASELINE_ITERS_PER_S, 2),
                        }
                    )
                )
                return
            except Exception as e:  # transient axon tunnel errors
                last_err = e
                time.sleep(5)
    print(
        json.dumps(
            {
                "metric": "admm_l1_image_iterations_per_s_1chip",
                "value": 0.0,
                "unit": "FAILED: " + repr(last_err)[:200],
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
