"""Full-iteration fused ADMM-L1 Pallas kernel (round-5 experiment).

The round-5 device-trace attribution (docs/PERF.md "Round-5 classical
attribution") showed the classical headline is HBM-bound on the DFT
chain's MATERIALIZED intermediates: XLA executes the 12 DFT matmuls of
one iteration as separate fusions, each streaming a full (B, 256, 129)
f32 intermediate to HBM (~4.8 MB/image-iteration total), bounding the
pipeline at ~171k image-iters/s while the MXU idles.

This kernel runs the ENTIRE iteration — forward half-spectrum DFT,
blend ``A .* V + C``, inverse DFT, magnitude, soft-threshold z-update,
dual ascent — inside ONE Pallas program, gridding over the batch in
blocks small enough that every intermediate lives in VMEM. HBM traffic
drops to the state reads/writes (z, w in; z, w out = ~1 MB/image-iter
plus the shared constants), moving the bound from memory (~171k) to
compute (~323k at Precision.HIGH).

Math is identical to ``fourier.make_rfft_data_consistency('matmul')`` +
``prox.soft`` + dual ascent (the exact einsums of ``matmul_rfft2`` /
``matmul_irfft2``), at the same 3-pass HIGH matmul precision; equality
is pinned by ``tests/test_pallas.py``. The old ``ops/pallas_kernels``
tail covered only the pointwise epilogue (measured slower than XLA's
fusion — the matmuls stayed un-fused); this kernel is the part that was
never tried.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.ops import fourier


def _iteration_kernel(z_ref, w_ref, cwh_ref, swh_ref, ch_ref, sh_ref,
                      cwt_ref, swt_ref, a_ref, cr_ref, ci_ref, thr_ref,
                      z_out_ref, w_out_ref):
    """One ADMM-L1 iteration for a (B_blk, H, W) block, all in VMEM."""
    P = jax.lax.Precision.HIGHEST  # Mosaic lacks HIGH (bf16_3x); 6-pass exact
    ein = functools.partial(jnp.einsum, precision=P,
                            preferred_element_type=jnp.float32)
    z = z_ref[:]
    w = w_ref[:]
    v = z - w
    cwh = cwh_ref[:]   # (W, Wh)
    swh = swh_ref[:]
    ch = ch_ref[:]     # (H, H)
    sh = sh_ref[:]
    # forward rfft2 (matmul_rfft2's einsums, verbatim)
    xr = ein("bhw,wk->bhk", v, cwh)
    xi = -ein("bhw,wk->bhk", v, swh)
    yr = ein("mh,bhk->bmk", ch, xr) + ein("mh,bhk->bmk", sh, xi)
    yi = ein("mh,bhk->bmk", ch, xi) - ein("mh,bhk->bmk", sh, xr)
    # blend H = A .* V + C
    a = a_ref[:]
    hr = a * yr + cr_ref[:]
    hi = a * yi + ci_ref[:]
    # inverse (matmul_irfft2): columns first, then real synthesis
    h = ch.shape[0]
    ir = (ein("hm,bhk->bmk", ch, hr) - ein("hm,bhk->bmk", sh, hi)) / h
    ii = (ein("hm,bhk->bmk", ch, hi) + ein("hm,bhk->bmk", sh, hr)) / h
    wh = cwh.shape[1]
    # bin weights without scatter (.at[].set lowers to scatter — not
    # supported in Mosaic) and with 2-D iota (1-D iota is TPU-invalid)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, wh), 1)
    wk = jnp.where((kidx == 0) | (kidx == wh - 1), 1.0, 2.0
                   ).astype(jnp.float32)
    wf = cwh.shape[0]
    x = (ein("bhk,kw->bhw", ir * wk, cwt_ref[:])
         - ein("bhk,kw->bhw", ii * wk, swt_ref[:])) / wf
    x = jnp.abs(x)
    # z-update (soft threshold) + dual ascent
    thr = thr_ref[0]
    u = x + w
    z_new = jnp.sign(u) * jnp.maximum(jnp.abs(u) - thr, 0.0)
    z_out_ref[:] = z_new
    w_out_ref[:] = w + x - z_new


def make_fused_iteration(a_half, cr, ci, h: int, w: int, thr: float,
                         block: int = 4, interpret: bool = False):
    """-> ``step(z, w) -> (z_new, w_new)`` — one fused ADMM-L1 iteration.

    ``a_half``/``cr``/``ci``: the blend fields from
    ``make_rfft_data_consistency``'s closed form; ``thr`` = rho * lam.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wh = w // 2 + 1
    cw, sw = fourier._dft_mats(w, jnp.float32)
    chm, shm = (cw, sw) if h == w else fourier._dft_mats(h, jnp.float32)
    cwh = jnp.asarray(cw[:, :wh])
    swh = jnp.asarray(sw[:, :wh])
    cwt = jnp.asarray(cw[:wh, :])   # row-synthesis (Wh, W) — cw symmetric
    swt = jnp.asarray(sw[:wh, :])
    a_j = jnp.asarray(a_half, jnp.float32)
    cr_j = jnp.asarray(cr, jnp.float32)
    ci_j = jnp.asarray(ci, jnp.float32)
    thr_j = jnp.asarray([thr], jnp.float32)

    def step(z, wdual):
        b = z.shape[0]
        grid = (b // block,)
        blk = lambda i: (i, 0, 0)
        full = lambda i: (0, 0)
        state_spec = pl.BlockSpec((block, h, w), blk)
        # C = blend offset derives from the per-image observation y:
        # (B, H, Wh), blocked over batch like the state; A is mask-only 2D
        c_spec = pl.BlockSpec((block, h, wh), blk)
        out = pl.pallas_call(
            _iteration_kernel,
            out_shape=(jax.ShapeDtypeStruct(z.shape, jnp.float32),
                       jax.ShapeDtypeStruct(z.shape, jnp.float32)),
            grid=grid,
            in_specs=[
                state_spec, state_spec,
                pl.BlockSpec((w, wh), full),
                pl.BlockSpec((w, wh), full),
                pl.BlockSpec((h, h), full),
                pl.BlockSpec((h, h), full),
                pl.BlockSpec((wh, w), full),
                pl.BlockSpec((wh, w), full),
                pl.BlockSpec((h, wh), full),
                c_spec,
                c_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(state_spec, state_spec),
            interpret=interpret,
        )(z, wdual, cwh, swh, chm, shm, cwt, swt, a_j, cr_j, ci_j, thr_j)
        return out

    return step


def admm_l1_fused_kernel(y, mask, cfg, block: int = 4,
                         interpret: bool = False):
    """ADMM-L1 with the full-iteration Pallas kernel (bench/experimental).

    Same math as ``admm.admm_l1(..., dc_method='matmul', fused=False)``
    with the unpacked matmul DC; returns the final x like the solver.
    Batch must be a multiple of ``block``.
    """
    from pnp_admm_cnc_mri_tpu.solvers import admm as admm_mod

    h, w = mask.shape[-2:]
    # build the blend fields exactly as make_rfft_data_consistency does
    la2 = 1.0 / (2.0 * cfg.rho)
    m = (mask != 0).astype(y.real.dtype)
    yz = jnp.where(m != 0, y, 0.0)
    m_neg = jnp.roll(jnp.flip(m, axis=(-2, -1)), shift=(1, 1),
                     axis=(-2, -1))
    y_neg_conj = jnp.conj(jnp.roll(jnp.flip(yz, axis=(-2, -1)),
                                   shift=(1, 1), axis=(-2, -1)))
    half = w // 2 + 1
    a_full = ((2.0 - m - m_neg) / 2.0
              + la2 * (m + m_neg) / (2.0 * (1.0 + la2)))
    c_full = (m * yz + m_neg * y_neg_conj) / (2.0 * (1.0 + la2))
    a_half = a_full[..., :half]
    c_half = c_full[..., :half]

    step = make_fused_iteration(a_half, c_half.real, c_half.imag, h, w,
                                cfg.rho * cfg.lam, block=block,
                                interpret=interpret)
    state = admm_mod.init_state(y, jnp.float32)

    def body(carry, _):
        z, wd = carry
        return step(z, wd), None

    # The solver's final x is computed from the (z, w) entering the LAST
    # iteration: run N-1 fused steps, then one regular DC solve.
    (z, wd), _ = jax.lax.scan(body, (state.z, state.w), None,
                              length=max(cfg.iter_num - 1, 0))
    dc = fourier.make_rfft_data_consistency(y, mask, cfg.rho,
                                            method="matmul")
    return dc(z - wd).astype(jnp.float32), z, wd
