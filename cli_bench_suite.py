"""Full benchmark matrix: every solver family, throughput + quality.

    python cli_bench_suite.py [--cpu] [--batch N] [--out results/bench.jsonl]

Reports one JSON line per configuration (algorithm, batch, iters/s,
quality on set1) — the expanded companion to the single-line bench.py the
driver consumes. Timing forces scalar fetches (axon-safe).
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
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iter_num", type=int, default=50)
    p.add_argument("--out", default=None)
    p.add_argument("--skip_bm3d", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import (
        ADMM_CNC_DEFAULT,
        ADMM_L1_DEFAULT,
        ADMMConfig,
    )
    from pnp_admm_cnc_mri_tpu.data import images, masks, noise
    from pnp_admm_cnc_mri_tpu.priors import bm3d_prior, denoiser as dn
    from pnp_admm_cnc_mri_tpu.solvers import admm
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    # Synthesize the observation batch ON DEVICE: MB-scale host->device
    # transfers stall through the axon tunnel (see bench.py). Only the
    # 256x256 mask/noise assets (<1 MB) and the PRNG key cross it, as jit
    # ARGUMENTS (closed-over device constants hit UNIMPLEMENTED fetches).
    mask = masks.load_mask("Q_Random30")
    kn = noise.load_noise()

    # complex64 host->device transfers are UNIMPLEMENTED on axon: ship the
    # noise as two f32 planes and recombine on device.
    @jax.jit
    def synth(key, m_host, kn_re, kn_im):
        imgs = jax.random.uniform(key, (args.batch, 256, 256), jnp.float32)
        kn_dev = kn_re + 1j * kn_im
        return (jnp.fft.fft2(imgs, axes=(-2, -1)) * m_host + kn_dev).astype(
            jnp.complex64)

    m = jnp.asarray(mask, jnp.float32)
    y = synth(jax.random.PRNGKey(0), m,
              jnp.asarray(np.real(kn), jnp.float32),
              jnp.asarray(np.imag(kn), jnp.float32))

    def timed(solve_fn, n_iters, batch):
        # The solver jits return an on-device SCALAR (mean reduced inside
        # jit): fetching anything else through the axon tunnel hits
        # UNIMPLEMENTED transfers.
        float(solve_fn())  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(solve_fn())
            times.append(time.perf_counter() - t0)
        dt = min(times)
        return batch * n_iters / dt, dt

    records = []

    def record(name, ips, dt, extra=None):
        rec = {
            "config": name,
            "image_iters_per_s": round(ips, 1),
            "wall_s": round(dt, 4),
            "batch": args.batch,
            "iters": args.iter_num,
            "backend": jax.default_backend(),
        }
        rec.update(extra or {})
        records.append(rec)
        print(json.dumps(rec), flush=True)

    cfg_l1 = ADMMConfig(iter_num=args.iter_num, lam=0.1, rho=0.015)
    cfg_cnc = ADMMConfig(iter_num=args.iter_num, alpha=0.45, lam=0.5, rho=0.05, b=64.0)

    for name, solver, cfg, fused in [
        ("admm_l1_fused", admm.admm_l1, cfg_l1, True),
        ("admm_l1_unfused", admm.admm_l1, cfg_l1, False),
        ("admm_cnc_fused", admm.admm_cnc, cfg_cnc, True),
    ]:
        fn = jax.jit(
            lambda y, m, _solver=solver, _cfg=cfg, _fused=fused: _solver(
                y, m, _cfg, dtype=jnp.float32, fused=_fused
            )[0].x.mean()
        )
        ips, dt = timed(lambda: fn(y, m), args.iter_num, args.batch)
        record(name, ips, dt)

    # Consensus ADMM (multi-mask fusion; dc_method=auto rides the packed
    # MXU matmul DC path on accelerators as of round 2)
    from pnp_admm_cnc_mri_tpu.parallel import consensus as cons

    n_obs = min(4, int(y.shape[0]))
    masks_c = jnp.stack([jnp.roll(m, 17 * i, axis=1) for i in range(n_obs)])
    y_cons = y[:n_obs]  # treat as n_obs observations of one image
    cfg_cons = ADMMConfig(iter_num=args.iter_num, lam=0.1, rho=0.05)
    fn = jax.jit(
        lambda ys, ms: cons.run_consensus(ys, ms, cfg_cons,
                                          dtype=jnp.float32)[0].mean()
    )
    ips, dt = timed(lambda: fn(y_cons, masks_c), args.iter_num, n_obs)
    record("consensus_l1_4obs", ips, dt, {"batch": n_obs})

    # PnP with a DnCNN prior (random weights; throughput measurement)
    den = dn.build_denoiser("dncnn_15")
    cfg_d = ADMMConfig(iter_num=args.iter_num, rho=0.15)
    fn = jax.jit(
        lambda y, m: admm.pnp_admm_l1(y, m, cfg_d, den, dtype=jnp.float32)[0].x.mean()
    )
    small = y[: max(1, args.batch // 8)]
    ips, dt = timed(lambda: fn(small, m), args.iter_num, small.shape[0])
    record("pnp_dncnn17", ips, dt, {"batch": int(small.shape[0])})

    # PnP-FISTA (gradient-form solver; same DnCNN prior for comparability)
    from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod

    fn = jax.jit(
        lambda y, m: fista_mod.pnp_fista(
            y, m, args.iter_num, den, dtype=jnp.float32)[0].x.mean()
    )
    ips, dt = timed(lambda: fn(small, m), args.iter_num, small.shape[0])
    record("pnp_fista_dncnn17", ips, dt, {"batch": int(small.shape[0])})

    # PnP-HQS (DPIR ladder solver; same DnCNN prior)
    from pnp_admm_cnc_mri_tpu.solvers import hqs as hqs_mod

    fn = jax.jit(
        lambda y, m: hqs_mod.pnp_hqs(
            y, m, args.iter_num, den, dtype=jnp.float32)[0].mean()
    )
    ips, dt = timed(lambda: fn(small, m), args.iter_num, small.shape[0])
    record("pnp_hqs_dncnn17", ips, dt, {"batch": int(small.shape[0])})

    # RED fixed-point (gradient + denoiser-residual step; same prior)
    from pnp_admm_cnc_mri_tpu.solvers import red as red_mod

    fn = jax.jit(
        lambda y, m: red_mod.run_red(
            y, m, args.iter_num, den, dtype=jnp.float32)[0].mean()
    )
    ips, dt = timed(lambda: fn(small, m), args.iter_num, small.shape[0])
    record("red_dncnn17", ips, dt, {"batch": int(small.shape[0])})

    # consensus-FISTA (union-preconditioned fused gradient, L1 prox)
    from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod

    fn = jax.jit(
        lambda ys, ms: cons.run_consensus_fista(
            ys, ms, args.iter_num,
            lambda i, u: prox_mod.soft(u, 5e-3)).mean()
    )
    ips, dt = timed(lambda: fn(y_cons, masks_c), args.iter_num, n_obs)
    record("consensus_fista_l1_4obs", ips, dt, {"batch": n_obs})

    # consensus-HQS (exact joint data solve, setup-only reductions, L1 prox)
    fn = jax.jit(
        lambda ys, ms: cons.run_consensus_hqs(
            ys, ms, args.iter_num,
            lambda u, i: prox_mod.soft(u, 5e-3)).mean()
    )
    ips, dt = timed(lambda: fn(y_cons, masks_c), args.iter_num, n_obs)
    record("consensus_hqs_l1_4obs", ips, dt, {"batch": n_obs})

    if not args.skip_bm3d:
        den_b = bm3d_prior.make_bm3d_denoiser()
        cfg_b = ADMMConfig(iter_num=5, rho=0.8)
        one = y[:1]
        fn = jax.jit(
            lambda y, m: admm.pnp_admm_l1(y, m, cfg_b, den_b, clamp=False,
                                          dtype=jnp.float32)[0].x.mean()
        )
        ips, dt = timed(lambda: fn(one, m), 5, 1)
        record("pnp_bm3d_5it", ips, dt, {"batch": 1, "iters": 5})

        # steady-state throughput: REP solves scanned inside one jit, so
        # the axon tunnel's ~24.5 ms dispatch+fetch floor (which is 20%+
        # of the single-solve wall time) amortizes away — this is the
        # sustained rate of a long reconstruction job
        REP = 4
        @jax.jit
        def fn_rep(y, m):
            def body(c, _):
                out = admm.pnp_admm_l1(y + c * 1e-9, m, cfg_b, den_b,
                                       clamp=False, dtype=jnp.float32)[0].x
                return jnp.mean(out) * 1e-9, None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))
            return s
        ips, dt = timed(lambda: fn_rep(one, m), 5 * REP, 1)
        record("pnp_bm3d_5it_steady", ips, dt,
               {"batch": 1, "iters": 5 * REP})

    if args.out:
        for r in records:
            logger_mod.append_record(args.out, r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
