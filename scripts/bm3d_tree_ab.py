"""Single-process alternating A/B: tree vs matrix BM3D stack filtering.

Builds BOTH jitted pipelines (the ``_STACK_FILTER_TREE`` toggle is read
at trace time), then times them interleaved so tunnel drift cannot skew
the comparison. Reports the 5-iteration PnP-BM3D solve and the
4x-scanned steady-state variant.

Usage: python scripts/bm3d_tree_ab.py [--cpu]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.priors import bm3d_prior
    from pnp_admm_cnc_mri_tpu.priors.bm3d import core
    from pnp_admm_cnc_mri_tpu.solvers import admm

    cfg = ADMMConfig(iter_num=5, rho=0.8)

    @jax.jit
    def synth(key):
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.uniform(k1, (1, 256, 256), jnp.float32)
        mask = (jax.random.uniform(k2, (256, 256)) < 0.3).astype(jnp.float32)
        noise = 3.0 * (jax.random.normal(k3, (256, 256))
                       + 1j * jax.random.normal(jax.random.fold_in(k3, 1),
                                                (256, 256)))
        y = (jnp.fft.fft2(img, axes=(-2, -1)) * mask
             + noise).astype(jnp.complex64)
        return y, mask

    y, m = synth(jax.random.PRNGKey(0))

    def build(tree: bool, rep: int):
        # jax.jit defers tracing to the first CALL — the toggle must stay
        # set through the compile below, or both variants trace under
        # 'auto' and the A/B compares the same program against itself
        # (the round-2 first-cut of this script had exactly that bug).
        core._STACK_FILTER_TREE = tree
        try:
            den = bm3d_prior.make_bm3d_denoiser()

            @jax.jit
            def fn(y, m):
                def body(c, _):
                    out = admm.pnp_admm_l1(y + c * 1e-9, m, cfg, den,
                                           clamp=False, dtype=jnp.float32)[0].x
                    return jnp.mean(out) * 1e-9, None

                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(rep))
                return s

            float(fn(y, m))  # trace + compile UNDER the toggle
        finally:
            core._STACK_FILTER_TREE = None
        return fn

    out = {}
    for rep, tag in [(1, "pnp_bm3d_5it"), (4, "pnp_bm3d_5it_steady")]:
        fns = {"matrix": build(False, rep), "tree": build(True, rep)}
        times = {"matrix": [], "tree": []}
        for _ in range(4):  # interleaved
            for name, fn in fns.items():
                t0 = time.perf_counter()
                float(fn(y, m))
                times[name].append(time.perf_counter() - t0)
        for name in fns:
            dt = min(times[name])
            out[f"{tag}_{name}"] = {"wall_s": round(dt, 4),
                                    "ips": round(rep * 5 / dt, 2)}
            print(tag, name, out[f"{tag}_{name}"], flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
