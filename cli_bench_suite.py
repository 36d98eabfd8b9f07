"""Full benchmark matrix: every solver family, throughput + quality.

    python cli_bench_suite.py [--cpu] [--batch N] [--out results/bench.jsonl]

Reports one JSON line per configuration (algorithm, batch, iters/s,
quality on set1) — the expanded companion to the single-line bench.py the
driver consumes. Timing forces scalar fetches (axon-safe).

Every row carries:

- ``spread_pct`` — (max-min)/median over the N=3 timed repeats, so
  regressions are distinguishable from axon-tunnel weather (same-day
  suite runs historically drift ~15%);
- on TPU, ``pct_sol`` + ``modeled_gflop_per_image_iter`` +
  ``modeled_mb_per_image_iter`` — a per-family speed-of-light estimate
  from XLA's own compiled-program cost analysis (flops + bytes accessed
  of the exact HLO that ran), against the v5e ceilings: 197 TFLOP/s bf16
  MXU / 3 for the f32-accurate 3-pass einsums this package uses
  (Precision.HIGH), 819 GB/s HBM. The SoL time is
  max(flops/peak_flops, bytes/peak_bw); pct_sol = 100 * SoL / measured.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# v5e public specs (one chip); /3: Precision.HIGH einsums run 3 bf16 passes
PEAK_FLOPS_F32EQ = 197e12 / 3
PEAK_HBM_BPS = 819e9


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
    from pnp_admm_cnc_mri_tpu.utils import flops as flops_mod
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

    def timed(fn, fargs, n_iters, batch):
        # The solver jits return an on-device SCALAR (mean reduced inside
        # jit): fetching anything else through the axon tunnel hits
        # UNIMPLEMENTED transfers. AOT lower+compile so the same
        # executable provides both the timing and its cost analysis.
        compiled = fn.lower(*fargs).compile()
        cost = None
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if ca:
                cost = {"flops": float(ca.get("flops", 0.0)),
                        "bytes": float(ca.get("bytes accessed", 0.0))}
        except Exception:
            pass
        # Exact matmul-class FLOPs from the traced jaxpr
        # (utils/flops.matmul_flops). Round 5 arbitration
        # (scripts/profile_arbitration.py, results/mxu_arbitration_r5.jsonl)
        # proved the axon backend's cost_analysis() counts a lax.scan BODY
        # ONCE regardless of trip count (undercount factor == scan length:
        # 20.2x at 20 reps, 50.5x at 50), so every flop-derived column the
        # round-4 suite emitted from cost_analysis was ~iter_num-times too
        # low. The jaxpr count is backend-independent and multiplies scan
        # bodies by their trip count; the device trace confirms it (conv
        # fusions at ~193 TF/s, conv time ~92% of the loop).
        try:
            jflops = flops_mod.matmul_flops(fn, *fargs)
        except Exception:
            jflops = 0.0
        float(np.asarray(compiled(*fargs)))  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(compiled(*fargs)))
            times.append(time.perf_counter() - t0)
        dt = statistics.median(times)
        extra = {"spread_pct": round(100.0 * (max(times) - min(times)) / dt, 1)}
        n_image_iters = batch * n_iters
        if jflops > 0 and jax.default_backend() != "cpu":
            extra["modeled_gflop_per_image_iter"] = round(
                jflops / n_image_iters / 1e9, 3)
            extra["achieved_tflops"] = round(jflops / dt / 1e12, 1)
            # bf16 MXU peak is the right bound for conv stacks (XLA lowers
            # f32 convs single-pass bf16 w/ f32 accumulate); the classical
            # solvers' Precision.HIGH DFT matmuls are bound by the 3-pass
            # f32-einsum peak instead — read the matching column per row.
            extra["pct_mxu_bf16"] = round(100.0 * jflops / dt / 197e12, 1)
            extra["pct_sol"] = round(
                100.0 * (jflops / PEAK_FLOPS_F32EQ) / dt, 1)
        if cost and cost["flops"] > 0 and jax.default_backend() != "cpu":
            # raw cost_analysis flops kept for the record (known broken:
            # scan bodies counted once — see arbitration note above)
            extra["cost_analysis_gflop"] = round(cost["flops"] / 1e9, 3)
        return n_image_iters / dt, dt, extra

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
        ips, dt, ex = timed(fn, (y, m), args.iter_num, args.batch)
        record(name, ips, dt, ex)

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
    ips, dt, ex = timed(fn, (y_cons, masks_c), args.iter_num, n_obs)
    record("consensus_l1_4obs", ips, dt, {"batch": n_obs, **ex})

    # BATCHED consensus (round 4): B independent consensus problems in one
    # program (observation axis -3) — the historical 1-problem rows above
    # are dispatch/latency-bound at 4x256^2 per iteration; these fill the
    # chip like the single-mask batch rows. image-iters counts B*N_obs.
    n_prob = max(1, args.batch // n_obs)
    y_batched = y[: n_prob * n_obs].reshape(n_prob, n_obs, *y.shape[-2:])
    fn = jax.jit(
        lambda ys, ms: cons.run_consensus(ys, ms, cfg_cons,
                                          dtype=jnp.float32)[0].mean()
    )
    ips, dt, ex = timed(fn, (y_batched, masks_c), args.iter_num,
                        n_prob * n_obs)
    record(f"consensus_l1_b{n_prob}x{n_obs}obs", ips, dt,
           {"batch": n_prob * n_obs, **ex})

    # PnP with a DnCNN prior (random weights; throughput measurement)
    den = dn.build_denoiser("dncnn_15")
    cfg_d = ADMMConfig(iter_num=args.iter_num, rho=0.15)
    fn = jax.jit(
        lambda y, m: admm.pnp_admm_l1(y, m, cfg_d, den, dtype=jnp.float32)[0].x.mean()
    )
    small = y[: max(1, args.batch // 8)]
    ips, dt, ex = timed(fn, (small, m), args.iter_num, small.shape[0])
    record("pnp_dncnn17", ips, dt, {"batch": int(small.shape[0]), **ex})

    # PnP-FISTA (gradient-form solver; same DnCNN prior for comparability)
    from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod

    fn = jax.jit(
        lambda y, m: fista_mod.pnp_fista(
            y, m, args.iter_num, den, dtype=jnp.float32)[0].x.mean()
    )
    ips, dt, ex = timed(fn, (small, m), args.iter_num, small.shape[0])
    record("pnp_fista_dncnn17", ips, dt, {"batch": int(small.shape[0]), **ex})

    # TDNet (the MXU-shaped nc=128 prior, models/tdnet.py) in the same
    # ADMM loop as pnp_dncnn17 — the VERDICT r2 #4 throughput comparison
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        den_td = dn.build_denoiser("tdnet", iter_num=args.iter_num)
    fn = jax.jit(
        lambda y, m: admm.pnp_admm_l1(
            y, m, cfg_d, den_td, dtype=jnp.float32)[0].x.mean()
    )
    ips, dt, ex = timed(fn, (small, m), args.iter_num, small.shape[0])
    record("pnp_tdnet", ips, dt, {"batch": int(small.shape[0]), **ex})

    # same prior at the full suite batch: the MXU-shaped stack keeps
    # scaling where the nc=64 models plateau (batch-64 vs batch-8 row)
    ips, dt, ex = timed(fn, (y, m), args.iter_num, y.shape[0])
    record("pnp_tdnet_b%d" % y.shape[0], ips, dt,
           {"batch": int(y.shape[0]), **ex})

    # bf16 conv stack at full batch: +32% measured (the f32 stack already
    # runs ~65% of MXU bf16 peak; bf16 lifts it to ~87% — the pipeline is
    # compute-bound at the architecture's FLOP count, results/
    # pnp_attribution_r4.jsonl)
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        den_td16 = dn.build_denoiser("tdnet", iter_num=args.iter_num,
                                     compute_dtype=jnp.bfloat16)
    fn = jax.jit(
        lambda y, m: admm.pnp_admm_l1(
            y, m, cfg_d, den_td16, dtype=jnp.float32)[0].x.mean()
    )
    ips, dt, ex = timed(fn, (y, m), args.iter_num, y.shape[0])
    record("pnp_tdnet_b%d_bf16" % y.shape[0], ips, dt,
           {"batch": int(y.shape[0]), **ex})

    # Parity-CNN rows at full batch, f32 vs bf16 I/O (VERDICT r4 #6: the
    # reference-parity pipelines must keep nc=64; bf16 I/O is the one
    # measured lever — probe showed dncnn17 +21%. Quality is pinned
    # separately: --bf16 is measured quality-neutral, +-0.04 dB,
    # tests/test_models.py bf16 parity)
    fn = jax.jit(
        lambda y, m: admm.pnp_admm_l1(
            y, m, cfg_d, den, dtype=jnp.float32)[0].x.mean()
    )
    ips, dt, ex = timed(fn, (y, m), args.iter_num, y.shape[0])
    record("pnp_dncnn17_b%d" % y.shape[0], ips, dt,
           {"batch": int(y.shape[0]), **ex})
    den16 = dn.build_denoiser("dncnn_15", compute_dtype=jnp.bfloat16)
    fn = jax.jit(
        lambda y, m: admm.pnp_admm_l1(
            y, m, cfg_d, den16, dtype=jnp.float32)[0].x.mean()
    )
    ips, dt, ex = timed(fn, (y, m), args.iter_num, y.shape[0])
    record("pnp_dncnn17_b%d_bf16" % y.shape[0], ips, dt,
           {"batch": int(y.shape[0]), **ex})

    # PnP-HQS (DPIR ladder solver; same DnCNN prior)
    from pnp_admm_cnc_mri_tpu.solvers import hqs as hqs_mod

    fn = jax.jit(
        lambda y, m: hqs_mod.pnp_hqs(
            y, m, args.iter_num, den, dtype=jnp.float32)[0].mean()
    )
    ips, dt, ex = timed(fn, (small, m), args.iter_num, small.shape[0])
    record("pnp_hqs_dncnn17", ips, dt, {"batch": int(small.shape[0]), **ex})

    # RED fixed-point (gradient + denoiser-residual step; same prior)
    from pnp_admm_cnc_mri_tpu.solvers import red as red_mod

    fn = jax.jit(
        lambda y, m: red_mod.run_red(
            y, m, args.iter_num, den, dtype=jnp.float32)[0].mean()
    )
    ips, dt, ex = timed(fn, (small, m), args.iter_num, small.shape[0])
    record("red_dncnn17", ips, dt, {"batch": int(small.shape[0]), **ex})

    # consensus-FISTA (union-preconditioned fused gradient, L1 prox)
    from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod

    fn = jax.jit(
        lambda ys, ms: cons.run_consensus_fista(
            ys, ms, args.iter_num,
            lambda i, u: prox_mod.soft(u, 5e-3)).mean()
    )
    ips, dt, ex = timed(fn, (y_cons, masks_c), args.iter_num, n_obs)
    record("consensus_fista_l1_4obs", ips, dt, {"batch": n_obs, **ex})

    ips, dt, ex = timed(fn, (y_batched, masks_c), args.iter_num,
                        n_prob * n_obs)
    record(f"consensus_fista_l1_b{n_prob}x{n_obs}obs", ips, dt,
           {"batch": n_prob * n_obs, **ex})

    # consensus-HQS (exact joint data solve, setup-only reductions, L1 prox)
    fn = jax.jit(
        lambda ys, ms: cons.run_consensus_hqs(
            ys, ms, args.iter_num,
            lambda u, i: prox_mod.soft(u, 5e-3)).mean()
    )
    ips, dt, ex = timed(fn, (y_cons, masks_c), args.iter_num, n_obs)
    record("consensus_hqs_l1_4obs", ips, dt, {"batch": n_obs, **ex})

    ips, dt, ex = timed(fn, (y_batched, masks_c), args.iter_num,
                        n_prob * n_obs)
    record(f"consensus_hqs_l1_b{n_prob}x{n_obs}obs", ips, dt,
           {"batch": n_prob * n_obs, **ex})

    if not args.skip_bm3d:
        cfg_b = ADMMConfig(iter_num=5, rho=0.8)
        # batch 1 (the historical row) + vmapped batches: the BM3D prior
        # processes `batch_chunk` images concurrently (round-3 change;
        # previously lax.map serialized the batch on device and every
        # recorded BM3D number was batch 1)
        for nb, chunk in [(1, 1), (4, 4), (8, 8)]:
            den_b = bm3d_prior.make_bm3d_denoiser(batch_chunk=chunk)
            fn = jax.jit(
                lambda y, m, _d=den_b: admm.pnp_admm_l1(
                    y, m, cfg_b, _d, clamp=False,
                    dtype=jnp.float32)[0].x.mean()
            )
            ips, dt, ex = timed(fn, (y[:nb], m), 5, nb)
            tag = "pnp_bm3d_5it" if nb == 1 else f"pnp_bm3d_5it_b{nb}"
            record(tag, ips, dt, {"batch": nb, "iters": 5, **ex})

        # steady-state throughput: REP solves scanned inside one jit, so
        # the axon tunnel's ~24.5 ms dispatch+fetch floor (which is 20%+
        # of the single-solve wall time) amortizes away — this is the
        # sustained rate of a long reconstruction job
        REP = 4
        den_b = bm3d_prior.make_bm3d_denoiser(batch_chunk=1)
        one = y[:1]
        @jax.jit
        def fn_rep(y, m):
            def body(c, _):
                out = admm.pnp_admm_l1(y + c * 1e-9, m, cfg_b, den_b,
                                       clamp=False, dtype=jnp.float32)[0].x
                return jnp.mean(out) * 1e-9, None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))
            return s
        ips, dt, ex = timed(fn_rep, (one, m), 5 * REP, 1)
        record("pnp_bm3d_5it_steady", ips, dt,
               {"batch": 1, "iters": 5 * REP, **ex})

    if args.out:
        for r in records:
            logger_mod.append_record(args.out, r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
