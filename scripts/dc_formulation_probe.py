"""A/B probe: matmul DC-solve formulations on the chip.

Configurations (toggled via ``fourier._MATMUL_PACKED`` / ``_MATMUL_K3``):
  unpacked   — round-1 path: 12 einsums/iter, half-grid 129 wide
               (MXU pads every 129-lane dim to 256).
  packed     — Nyquist column packed into the sin-matrix DC slots
               (one-time matrix edits, zero per-iteration traffic):
               every einsum exactly 128-lane-aligned.
  packed_k3  — + Karatsuba 3-matmul complex products on the H axis
               (8 H-axis matmuls/iter -> 6).

Each configuration runs the full bench.py ADMM-L1 solve (batch x 50
iters) in a SUBPROCESS with a hard timeout (axon rules). Also verifies
reconstruction quality parity (mean |x| of the solve must agree across
formulations to ~1e-5).

Usage: python scripts/dc_formulation_probe.py [--batch 512] [--cpu]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIGS = {
    "unpacked": (False, False),
    "packed": (True, False),
    "packed_k3": (True, True),
}


def _single(config: str, batch: int, force_cpu: bool) -> None:
    import functools

    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.ops import fourier
    from pnp_admm_cnc_mri_tpu.solvers import admm

    fourier._MATMUL_PACKED, fourier._MATMUL_K3 = CONFIGS[config]

    cfg = ADMMConfig(iter_num=50, lam=0.1, rho=0.015)
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
        y = (jnp.fft.fft2(imgs, axes=(-2, -1)) * mask + noise).astype(jnp.complex64)
        final, _ = admm.admm_l1(y, mask, cfg, dtype=jnp.float32,
                                dc_method="matmul", fused=False)
        return jnp.mean(final.x)

    chk = float(make_and_solve(jax.random.PRNGKey(0), b=batch))  # compile
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        float(make_and_solve(jax.random.PRNGKey(i + 1), b=batch))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({"config": config, "ips": batch * 50 / dt,
                      "check_mean": chk}))


def main() -> None:
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        _single(sys.argv[i + 1], int(sys.argv[i + 2]), "--cpu" in sys.argv)
        return
    batch = 512
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    configs = list(CONFIGS)
    if "--configs" in sys.argv:
        configs = sys.argv[sys.argv.index("--configs") + 1].split(",")
    results = {}
    for config in configs:
        cmd = [sys.executable, __file__, "--single", config, str(batch)]
        if "--cpu" in sys.argv:
            cmd.append("--cpu")
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=600)
        except subprocess.TimeoutExpired:
            results[config] = {"error": "timeout"}
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results[config] = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            results[config] = {"error": proc.stderr[-500:]}
        print(config, results[config], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
