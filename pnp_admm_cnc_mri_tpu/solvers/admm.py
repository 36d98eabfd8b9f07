"""The ADMM fixed-point driver — one jitted ``lax.scan`` over iterations.

Where the reference runs a sequential Python loop per image with
per-iteration host<->device round trips (reference ``【1】ADMM_L1.py:111-126``,
``【3】PNP_ADMM_L1_D  .py:255-296``), this driver:

- carries the (x, z, w) state as a pytree through ``lax.scan`` so the whole
  50-iteration solve is a single XLA program;
- broadcasts over arbitrary leading batch axes, so a scenario grid of
  (images x masks x noise levels) solves in one program — shard the batch
  axes over a ``Mesh`` (see ``parallel/``) for multi-chip scaling;
- exposes the z-update as a pluggable callable, which is how every one of
  the six reference algorithms (L1 / CNC / x BM3D / x CNN denoiser) is
  expressed.

The algorithm math is identical to the reference:

    x_{k+1} = DC(z_k - w_k)                 # k-space data-consistency solve
    z_{k+1} = prox(x_{k+1} + w_k)           # L1 / CNC / denoiser
    w_{k+1} = w_k + x_{k+1} - z_{k+1}       # dual ascent
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.ops import fourier, prox


class ADMMState(NamedTuple):
    """Primal x, auxiliary z, scaled dual w — all real, shape (..., H, W)."""

    x: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray


# z_update(iteration_index, x, z, w) -> new z
ZUpdate = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def init_state(y: jnp.ndarray, dtype=jnp.float32) -> ADMMState:
    """Zero-filled magnitude init (reference ``【1】ADMM_L1.py:100-105``)."""
    x0 = jnp.abs(fourier.zero_fill(y)).astype(dtype)
    return ADMMState(x=x0, z=x0, w=jnp.zeros_like(x0))


def admm_step(
    state: ADMMState,
    i: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    rho,
    z_update: ZUpdate,
    clamp: bool = False,
    tail=None,
    dc=None,
) -> ADMMState:
    """One ADMM iteration; ``clamp`` reproduces the CNN-variant [0,1] clamp
    of x, z and the dual w (reference ``【3】PNP_ADMM_L1_D  .py:294-296``).

    ``tail(i, x, z, w) -> (z_new, w_new)`` optionally replaces the separate
    z-update + dual ascent with a fused implementation (Pallas kernel for
    the classical priors, ``ops/pallas_kernels.py``); ``dc`` an optional
    precomputed data-consistency solve (the rfft half-spectrum fast path,
    ``fourier.make_rfft_data_consistency``)."""
    if dc is not None:
        x = dc(state.z - state.w)
    else:
        x = fourier.data_consistency(state.z - state.w, y, mask, rho)
    x = x.astype(state.z.dtype)
    if tail is not None:
        z, w = tail(i, x, state.z, state.w)
    else:
        z = z_update(i, x, state.z, state.w)
        w = state.w + x - z
    if clamp:
        x, z, w = prox.clip01(x), prox.clip01(z), prox.clip01(w)
    return ADMMState(x=x, z=z, w=w)


# Back-compat alias: the resolver moved to ops.fourier so non-solver
# callers (parallel/consensus.py) can share it without importing solvers.
_resolve_dc_method = fourier.resolve_dc_method


def run_admm(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    rho,
    z_update: ZUpdate,
    clamp: bool = False,
    dtype=jnp.float32,
    collect_residuals: bool = False,
    tail=None,
    use_rfft: bool = True,
    dc_method: str = "auto",
):
    """Run ``iter_num`` fixed iterations as one ``lax.scan``.

    ``use_rfft`` enables the half-spectrum data-consistency fast path
    (identical math, half the FFT work; see
    ``fourier.make_rfft_data_consistency``). ``dc_method='matmul'``
    computes the transforms as MXU matmuls instead of the generic FFT
    kernel (measured 2.6x on the v5e for 256-sized images); ``'auto'``
    (default) picks matmul on accelerator backends for images up to
    1024 px and the FFT kernel on CPU.

    Returns ``(final_state, residuals)`` where residuals (if requested) is
    the per-iteration primal residual norm ``||x - z||_F`` per batch element
    — a psum-able convergence signal with no reference counterpart (the
    reference never monitors convergence).
    """
    state = init_state(y, dtype)
    dc_method = _resolve_dc_method(dc_method, y)
    dc = (fourier.make_rfft_data_consistency(y, mask, rho, method=dc_method)
          if use_rfft else None)

    def step(state, i):
        new = admm_step(state, i, y, mask, rho, z_update, clamp, tail=tail, dc=dc)
        out = None
        if collect_residuals:
            from pnp_admm_cnc_mri_tpu.parallel import reductions

            out = reductions.primal_residual_norm(new.x, new.z)
        return new, out

    final, res = jax.lax.scan(step, state, jnp.arange(iter_num))
    return final, res


def run_admm_tol(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    rho,
    z_update: ZUpdate,
    tol: float,
    clamp: bool = False,
    dtype=jnp.float32,
    use_rfft: bool = True,
    dc_method: str = "auto",
):
    """Tolerance-stopped variant (new capability; the reference always runs
    a fixed count, SURVEY.md §2.1 "Fixed iteration count").

    Runs until the worst-case relative primal residual
    ``max_batch ||x-z||/||x||`` drops below ``tol`` or ``iter_num`` is hit.
    Uses ``lax.while_loop`` with a static iteration cap, so it stays fully
    on-device. NOTE the return contract differs from ``run_admm``:
    returns ``(state, iterations_run)``.
    """
    state0 = init_state(y, dtype)
    dc_method = _resolve_dc_method(dc_method, y)
    dc = (fourier.make_rfft_data_consistency(y, mask, rho, method=dc_method)
          if use_rfft else None)

    def rel_residual(state):
        from pnp_admm_cnc_mri_tpu.parallel import reductions

        num = reductions.primal_residual_norm(state.x, state.z)
        den = jnp.sqrt(jnp.sum(state.x**2, axis=(-2, -1))) + 1e-12
        return jnp.max(num / den)

    def cond(carry):
        i, state, res = carry
        return jnp.logical_and(i < iter_num, res > tol)

    def body(carry):
        i, state, _ = carry
        new = admm_step(state, i, y, mask, rho, z_update, clamp, dc=dc)
        return i + 1, new, rel_residual(new)

    i, state, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), state0, jnp.asarray(jnp.inf, dtype))
    )
    return state, i


def run_admm_adaptive(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    rho0,
    z_update,
    gamma: float = 1.2,
    eta: float = 0.95,
    clamp: bool = False,
    dtype=jnp.float32,
    collect: bool = False,
):
    """Adaptive-rho PnP-ADMM with the residual-balancing continuation rule
    of Chan, Wang & Elgendy, "Plug-and-Play ADMM for Image Restoration:
    Fixed Point Convergence and Applications" (IEEE TCI 2017; PAPERS.md).
    New capability — the reference always runs a fixed, hand-tuned rho.

    Per iteration the combined residual
    ``D_k = (||x_k - x_{k-1}|| + ||z_k - z_{k-1}|| + ||w_k - w_{k-1}||)/sqrt(n)``
    is monitored per batch element; whenever it fails to shrink by factor
    ``eta``, that element's penalty is multiplied by ``gamma``. NOTE the
    framework's ``rho`` follows the reference's ``reo = 1/beta`` convention
    (``【4】ADMM_CNC .py:40``), the INVERSE of the paper's augmented-
    Lagrangian penalty — so the continuation *divides* rho by ``gamma``
    (monotone nonincreasing rho = monotone nondecreasing beta, the paper's
    fixed-point convergence condition for bounded denoisers). With
    ``gamma=1`` this reduces exactly to the fixed-rho ``run_admm``
    (cross-tested).

    ``z_update(i, x, z, w, rho)`` — the extra trailing ``rho`` argument
    (broadcastable ``(..., 1, 1)``) lets classical priors keep their
    rho-dependent thresholds as rho adapts; denoiser priors may ignore it.
    Returns ``(final_state, (rhos, deltas))`` traces when ``collect``.
    """
    state0 = init_state(y, dtype)
    batch_shape = state0.x.shape[:-2]
    n = state0.x.shape[-2] * state0.x.shape[-1]
    rho_init = jnp.broadcast_to(jnp.asarray(rho0, dtype), batch_shape)

    def norm(a):
        return jnp.sqrt(jnp.sum(a * a, axis=(-2, -1)))

    def step(carry, i):
        state, rho, delta_prev = carry
        rho_b = rho[..., None, None]
        x = fourier.data_consistency(state.z - state.w, y, mask, rho_b)
        x = x.astype(state.z.dtype)
        z = z_update(i, x, state.z, state.w, rho_b)
        w = state.w + x - z
        if clamp:
            x, z, w = prox.clip01(x), prox.clip01(z), prox.clip01(w)
        delta = (norm(x - state.x) + norm(z - state.z)
                 + norm(w - state.w)) / jnp.sqrt(jnp.asarray(n, dtype))
        rho_new = jnp.where(delta >= eta * delta_prev, rho / gamma, rho)
        out = (rho, delta) if collect else None
        return (ADMMState(x=x, z=z, w=w), rho_new, delta), out

    init = (state0, rho_init, jnp.full(batch_shape, jnp.inf, dtype))
    (final, _, _), trace = jax.lax.scan(step, init, jnp.arange(iter_num))
    return final, trace


# ---------------------------------------------------------------------------
# The four solver families over the generic driver
# ---------------------------------------------------------------------------


def _check_tol_kwargs(kw):
    """Tolerance mode returns (state, iterations_run), not residual traces
    — reject options it cannot honor instead of silently dropping them."""
    bad = set(kw) - {"use_rfft", "dc_method"}
    if bad:
        raise ValueError(
            f"options {sorted(bad)} are not supported with cfg.tol set "
            "(tolerance mode returns (state, iterations_run); use "
            "cfg.tol=None for residual collection)"
        )


def admm_l1(y, mask, cfg: ADMMConfig, dtype=jnp.float32, fused: bool = False, **kw):
    """ADMM-L1 (reference ``【1】ADMM_L1.py``): z = soft(x+w, rho*lam).

    ``fused=True`` runs the z/w tail as one Pallas kernel on TPU (identical
    math; falls back to jnp elsewhere). Off by default: measured on the
    v5e, XLA's own fusion of the jnp tail is ~30% faster end-to-end than
    the hand-written kernel (127k vs 96k image-iters/s at batch 256,
    matmul dc path) — the Pallas path remains for capability/tests."""

    def z_update(i, x, z, w):
        return prox.soft(x + w, cfg.rho * cfg.lam)

    if cfg.tol is not None:
        _check_tol_kwargs(kw)
        return run_admm_tol(y, mask, cfg.iter_num, cfg.rho, z_update, cfg.tol,
                            dtype=dtype, use_rfft=kw.get("use_rfft", True),
                            dc_method=kw.get("dc_method", "auto"))
    tail = None
    if fused:
        from pnp_admm_cnc_mri_tpu.ops import pallas_kernels

        tail = lambda i, x, z, w: pallas_kernels.l1_tail(x, z, w, cfg.rho * cfg.lam)
    return run_admm(y, mask, cfg.iter_num, cfg.rho, z_update, dtype=dtype, tail=tail, **kw)


def admm_l1_adaptive(y, mask, cfg: ADMMConfig, gamma: float = 1.2,
                     eta: float = 0.95, dtype=jnp.float32, collect: bool = False):
    """ADMM-L1 with Chan-style rho continuation (``run_admm_adaptive``):
    the soft-threshold tracks the adapting rho, ``soft(x+w, rho_k*lam)``."""

    def z_update(i, x, z, w, rho_b):
        return prox.soft(x + w, rho_b * cfg.lam)

    return run_admm_adaptive(y, mask, cfg.iter_num, cfg.rho, z_update,
                             gamma=gamma, eta=eta, dtype=dtype, collect=collect)


def pnp_admm_l1_adaptive(y, mask, cfg: ADMMConfig, denoise,
                         gamma: float = 1.2, eta: float = 0.95,
                         clamp: bool = True, dtype=jnp.float32,
                         collect: bool = False):
    """PnP-ADMM (denoiser prior) with Chan-style rho continuation; the
    denoiser ignores the adapting rho (its strength is iteration-scheduled),
    matching the paper's usage with off-the-shelf denoisers."""

    def z_update(i, x, z, w, rho_b):
        return denoise(x + w, i)

    return run_admm_adaptive(y, mask, cfg.iter_num, cfg.rho, z_update,
                             gamma=gamma, eta=eta, clamp=clamp, dtype=dtype,
                             collect=collect)


def admm_cnc(y, mask, cfg: ADMMConfig, dtype=jnp.float32, fused: bool = False, **kw):
    """ADMM-CNC (reference ``【4】ADMM_CNC .py``): GMC firm-threshold z-update."""

    def z_update(i, x, z, w):
        return prox.cnc_update(z, x + w, cfg.alpha, cfg.rho, cfg.lam, cfg.b)

    if cfg.tol is not None:
        _check_tol_kwargs(kw)
        return run_admm_tol(y, mask, cfg.iter_num, cfg.rho, z_update, cfg.tol,
                            dtype=dtype, use_rfft=kw.get("use_rfft", True),
                            dc_method=kw.get("dc_method", "auto"))
    tail = None
    if fused:
        from pnp_admm_cnc_mri_tpu.ops import pallas_kernels

        tail = lambda i, x, z, w: pallas_kernels.cnc_tail(
            x, z, w, cfg.alpha, cfg.rho, cfg.lam, cfg.b
        )
    return run_admm(y, mask, cfg.iter_num, cfg.rho, z_update, dtype=dtype, tail=tail, **kw)


def pnp_admm_l1(
    y,
    mask,
    cfg: ADMMConfig,
    denoise: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    clamp: bool = True,
    dtype=jnp.float32,
    **kw,
):
    """PnP-ADMM with a denoiser prior: z = D(x+w, i).

    Covers reference ``【2】PNP_ADMM_L1_BM3D .py`` (denoise = BM3D) and
    ``【3】PNP_ADMM_L1_D  .py`` (denoise = CNN). ``denoise(v, i)`` receives
    the iteration index for sigma-scheduled priors (DRUNet/IRCNN ladder).
    ``clamp=True`` mirrors the CNN variants' [0,1] clamping; BM3D variants
    in the reference do not clamp.
    """

    def z_update(i, x, z, w):
        return denoise(x + w, i)

    return run_admm(y, mask, cfg.iter_num, cfg.rho, z_update, clamp=clamp, dtype=dtype, **kw)


def pnp_admm_cnc(
    y,
    mask,
    cfg: ADMMConfig,
    denoise1: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    denoise2: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
    clamp: bool = True,
    dtype=jnp.float32,
    **kw,
):
    """PnP-CNC with denoisers in both threshold slots.

    Reference ``【5】PNP_ADMM_CNC_BM3D .py:133-136`` / ``【6】PNP_ADMM_CNC_D
    .py:300-302``:  s = D1(z); t = (1-a)z + a(x+w) + a rho lam b (z-s);
    z = D2(t). ``denoise2`` defaults to ``denoise1``; passing two different
    denoisers reproduces the reference's two-checkpoint
    ``PNP_ADMM_CNC_DnCNN`` variant (``【6】:372,517-519``).
    """
    d2 = denoise2 if denoise2 is not None else denoise1

    def z_update(i, x, z, w):
        s = denoise1(z, i)
        return prox.cnc_generalized_update(
            z, x + w, s, cfg.alpha, cfg.rho, cfg.lam, cfg.b, lambda t: d2(t, i)
        )

    return run_admm(y, mask, cfg.iter_num, cfg.rho, z_update, clamp=clamp, dtype=dtype, **kw)


@functools.partial(jax.jit, static_argnames=("iter_num",))
def admm_l1_jit(y, mask, iter_num: int, rho, lam):
    """Fully-jitted ADMM-L1 with traced (rho, lam) — recompile-free sweeps.

    Hyper-parameter sweeps (the reference's logs show hundreds of manual
    runs) become a single compiled program: vmap this over a (rho, lam)
    grid and the whole sweep executes in one launch.
    """

    def z_update(i, x, z, w):
        return prox.soft(x + w, rho * lam)

    final, _ = run_admm(y, mask, iter_num, rho, z_update, dtype=y.real.dtype)
    return final.x
