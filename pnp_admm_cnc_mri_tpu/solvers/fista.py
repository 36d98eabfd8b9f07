"""Accelerated proximal-gradient (ISTA / FISTA) solvers — one jitted scan.

New capability beyond the reference's ADMM-only surface (the reference
ships six ADMM fixed-point drivers and an unused gradient helper,
``utils/utils.py:50-55`` ``Df``): forward-backward splitting on the same
masked-FFT forward model,

    x_{k+1} = prox_{s g}( v_k - s * grad f(v_k) ),
    v_{k+1} = x_{k+1} + ((t_k - 1)/t_{k+1}) (x_{k+1} - x_k)   [FISTA]

with f(x) = ||M F x - y||^2 / (2 N) whose gradient is exactly the
reference's ``Df`` helper (``fourier.data_term_gradient``) and whose
Lipschitz constant is 1 (M F F^H M / N is an orthogonal projection), so
``step = 1.0`` is the canonical choice.

Why it belongs in this framework: the PnP literature the survey
retrieved analyzes exactly this iteration — Ryu et al. 2019 ("PnP
Methods Provably Converge with Properly Trained Denoisers",
PAPERS.md) prove convergence for PnP-FBS (this solver with a denoiser
prox) under denoiser-Lipschitz conditions, and Kamilov et al.'s
scalable-PnP line motivates gradient-form PnP where the data term has
no cheap proximal solve. Here the DC solve IS cheap, so ADMM stays the
quality workhorse — FISTA is the convergence-friendly alternative and
the natural host for gradient-only forward models.

Same conventions as ``solvers/admm.py``: trailing (H, W) axes, arbitrary
leading batch axes, one ``lax.scan``, prox pluggable as
``prox_fn(iteration_index, u) -> u_new`` (index first, like ``ZUpdate``,
so sigma-ladder denoiser priors drop in unchanged).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.ops import fourier, prox


class FISTAState(NamedTuple):
    """Iterate x, extrapolated point v, momentum scalar t."""

    x: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray


# prox_fn(iteration_index, u) -> new u
ProxFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def fista_extrapolate(x_old: jnp.ndarray, x_new: jnp.ndarray, t):
    """One Beck-Teboulle momentum update: ``(t_new, v_new)``.

    Shared by this module and the multi-observation consensus variants
    (``parallel/consensus.run_consensus_fista[_sharded]``) so the
    extrapolation formula lives in exactly one place.
    """
    t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t**2)) / 2.0
    v_new = x_new + ((t - 1.0) / t_new) * (x_new - x_old)
    return t_new, v_new


def data_objective(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray):
    """f(x) = ||M F x - y||^2 / (2 N), reduced over the trailing two axes.

    The normalization matches ``fourier.data_term_gradient`` (which is
    (1/N) F^H M (M F x - y) for the unnormalized FFT pair): this f has
    unit Lipschitz gradient on the sampled subspace.
    """
    res = fourier.fft2(x) * mask
    res = jnp.where(mask != 0, res - y, res)
    n = x.shape[-2] * x.shape[-1]
    return jnp.sum(jnp.abs(res) ** 2, axis=(-2, -1)) / (2.0 * n)


def run_fista(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    prox_fn: ProxFn,
    step: float = 1.0,
    momentum: bool = True,
    dtype=jnp.float32,
    collect_objective: bool = False,
    penalty_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    prox_takes_prev: bool = False,
):
    """Run ``iter_num`` FISTA (or ISTA/PGD with ``momentum=False``) iterations.

    Zero-filled magnitude init like the ADMM drivers (reference
    ``【1】ADMM_L1.py:100-105``). Returns ``(final_state, objectives)``
    where objectives (if requested) is the per-iteration data-term value
    at x plus ``penalty_fn(x)`` when given — for ISTA with ``step <= 1``
    the full objective (data + prox penalty) is monotone non-increasing,
    which the tests pin.

    ``prox_takes_prev``: call ``prox_fn(i, u, x_prev)`` — operators that
    linearize around the previous iterate (the CNC/GMC composition,
    ``pnp_pgd_cnc``) need the incumbent x in addition to the gradient
    point u.
    """
    x0 = jnp.abs(fourier.zero_fill(y)).astype(dtype)
    state = FISTAState(x=x0, v=x0, t=jnp.asarray(1.0, dtype))

    def iteration(state: FISTAState, i):
        g = jnp.real(fourier.data_term_gradient(state.v, y, mask)).astype(dtype)
        u = state.v - step * g
        if prox_takes_prev:
            x_new = prox_fn(i, u, state.x).astype(dtype)
        else:
            x_new = prox_fn(i, u).astype(dtype)
        if momentum:
            t_new, v_new = fista_extrapolate(state.x, x_new, state.t)
        else:
            t_new = state.t
            v_new = x_new
        out = None
        if collect_objective:
            out = data_objective(x_new, y, mask)
            if penalty_fn is not None:
                out = out + penalty_fn(x_new)
        return FISTAState(x=x_new, v=v_new, t=t_new), out

    state, objs = jax.lax.scan(iteration, state, jnp.arange(iter_num))
    return state, objs


def fista_l1(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int = 50,
    lam: float = 8e-4,
    step: float = 1.0,
    momentum: bool = True,
    dtype=jnp.float32,
    collect_objective: bool = False,
):
    """FISTA for ``min lam * ||x||_1 + ||M F x - y||^2 / (2 N)``.

    The prox is one soft-threshold at ``step * lam`` per iteration. The
    same convex objective underlies ADMM-L1 (its z-prox threshold
    ``rho * lam_admm`` corresponds to ``lam = lam_admm / 2`` here up to
    the reference's magnitude-projection quirk), so tuned FISTA matches
    ADMM-L1's reconstruction quality on the golden scenario — see
    ``tests/test_fista.py``.
    """
    return run_fista(
        y, mask, iter_num,
        lambda i, u: prox.soft(u, step * lam),
        step=step, momentum=momentum, dtype=dtype,
        collect_objective=collect_objective,
        penalty_fn=lambda x: lam * jnp.sum(jnp.abs(x), axis=(-2, -1)),
    )


def pnp_fista(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    denoise: Callable,
    step: float = 1.0,
    clamp: bool = True,
    dtype=jnp.float32,
    momentum: bool = True,
):
    """PnP-FBS / PnP-FISTA: a denoiser as the proximal operator.

    ``denoise(u, i)`` takes the image and the iteration index (the
    ``priors.denoiser`` builders' calling convention, so sigma-ladder
    models drop in unchanged). Ryu et al. 2019 analyze this iteration's
    convergence; ``clamp`` keeps iterates in [0,1] like the reference's
    CNN-variant ADMM loops (``【3】PNP_ADMM_L1_D  .py:294-296``).
    """

    def prox_fn(i, u):
        z = denoise(u, i)
        return prox.clip01(z) if clamp else z

    return run_fista(y, mask, iter_num, prox_fn, step=step, dtype=dtype,
                     momentum=momentum)


def pgd_l1(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int = 50,
    lam: float = 8e-4,
    step: float = 1.0,
    dtype=jnp.float32,
    collect_objective: bool = False,
):
    """Plain proximal-gradient (ISTA) for the L1 problem — momentum off.

    The reference demonstrably ran this family: its results tree records
    full metric logs for a deleted "PGD soft" entry script
    (``/root/reference/results/Set_dn_PGD_L1/Set_dn_PGD_L1.log:1-17``,
    best observed Set average 23.45 dB; ``Set1_dnPGD soft/…log`` sweeps
    an ``alpha`` step-size knob over 0.4-1.0). This is ``fista_l1`` with
    the Beck-Teboulle extrapolation disabled; ``step`` plays the
    reference's ``alpha`` role.
    """
    return fista_l1(y, mask, iter_num=iter_num, lam=lam, step=step,
                    momentum=False, dtype=dtype,
                    collect_objective=collect_objective)


def pnp_pgd(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    denoise: Callable,
    step: float = 1.0,
    clamp: bool = True,
    dtype=jnp.float32,
):
    """PnP-PGD (ISTA with a denoiser prox) — the reference's deleted
    ``PNP_PGD_L1_BM3D`` pipeline family
    (``/root/reference/results/Set1_dn_PNP_PGD_L1_BM3D/…log`` 26.01 dB on
    11.png, ``Set_dn_PNP_PGD_L1_BM3D/…log`` best 24.69 Set average)."""
    return pnp_fista(y, mask, iter_num, denoise, step=step, clamp=clamp,
                     dtype=dtype, momentum=False)


def pnp_pgd_cnc(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    denoise1: Callable,
    denoise2: Optional[Callable] = None,
    alpha: float = 1.2,
    lam: float = 0.02,
    b: float = 36.0,
    step: float = 1.0,
    clamp: bool = True,
    dtype=jnp.float32,
):
    """PGD with the CNC (GMC) double-denoiser composition as the prox.

    Evidenced in the reference only by output images
    (``/root/reference/results/Set1_dnPGD soft/11_PNP_PGD_CNC_BM3D.png``,
    ``Set_dn_fdncnn_gray/01PNP_PGD_CNC_D.png`` — the entry scripts were
    deleted before publication). Composition mirrors the ADMM-CNC
    z-update (``【5】PNP_ADMM_CNC_BM3D .py:133-136``) with the gradient
    point u = v - step*grad in the ``x + w`` slot and the previous
    iterate as the GMC linearization point:

        s = D1(x);  t = (1-a) x + a u + a step lam b (x - s);  x' = D2(t)

    (``step`` takes the rho slot of the ADMM correction — in PGD the
    prox is of step-scaled strength).
    """
    d2 = denoise2 if denoise2 is not None else denoise1

    def prox_fn(i, u, x_prev):
        s = denoise1(x_prev, i)
        z = prox.cnc_generalized_update(
            x_prev, u, s, alpha, step, lam, b, lambda t: d2(t, i))
        return prox.clip01(z) if clamp else z

    return run_fista(y, mask, iter_num, prox_fn, step=step, momentum=False,
                     dtype=dtype, prox_takes_prev=True)
