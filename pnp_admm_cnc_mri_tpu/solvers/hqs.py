"""Half-quadratic splitting (HQS) solvers — the DPIR iteration for MRI.

The reference vendors DPIR's sigma-ladder helper (``utils/utils_pnp.py:14-23``,
``get_rho_sigma``) and uses it only to *condition* denoisers inside its ADMM
loops; the iteration that ladder was designed for — Zhang et al.'s DPIR
half-quadratic splitting ("Plug-and-Play Image Restoration with Deep Denoiser
Prior", PAPERS.md) — never appears for the MRI problem. This framework
already runs HQS for the SR/deblur pipelines (``cli/experiments.run_sr`` /
``run_deblur`` over ``ops/sisr``); this module completes the family with the
masked-FFT MRI forward model, as a third MRI solver family beside ADMM
(``solvers/admm.py``) and FISTA (``solvers/fista.py``):

    x_{k+1} = argmin_x ||M F x - y||^2 + alpha_k ||x - z_k||^2   (k-space
              diagonal solve: xf = (y + alpha_k zf)/(1 + alpha_k) at sampled
              frequencies, zf elsewhere)
    z_{k+1} = D_{sigma_k}(x_{k+1})                                (denoiser)

with ``alpha_k`` increasing along the ladder (``rho_k = 0.23 sigma^2 /
sigma_k^2``) as the denoiser strength ``sigma_k`` decays — strong data
consistency early, prior trusted more as iterates clean up. No dual
variable, two ops per iteration, one jitted ``lax.scan``.

Same conventions as the other solver modules: trailing (H, W) axes,
arbitrary leading batch axes, ``denoise(u, i)`` receives the iteration
index so ladder-conditioned priors (DRUNet/IRCNN) drop in unchanged.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.ops import fourier, prox, schedules


def run_hqs(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    denoise: Callable,
    alphas,
    clamp: bool = True,
    dtype=jnp.float32,
    collect_residuals: bool = False,
):
    """Run ``iter_num`` HQS iterations as one ``lax.scan``.

    ``alphas`` — length-``iter_num`` data-solve weights (DPIR's ``rhos``
    from ``schedules.get_rho_sigma``; larger alpha = weaker data pull).
    The x-step reuses the ADMM data-consistency solve via the convention
    map ``La2 = alpha`` i.e. ``rho = 1/(2 alpha)`` (``fourier.
    data_consistency`` solves with ``La2 = 1/(2 rho)``), including the
    reference's magnitude projection ``|real(ifft2(.))|``
    (``【1】ADMM_L1.py:120``) so iterates stay real non-negative for the
    denoiser. ``denoise(u, i)`` is the shared prior convention.

    Zero-filled magnitude init like every solver here (reference
    ``【1】ADMM_L1.py:100-105``). Returns ``(z_final, residuals)`` where
    residuals (if requested) is the per-iteration ``||x - z||_F`` per
    batch element — the same psum-able convergence signal the ADMM
    drivers expose.
    """
    z0 = jnp.abs(fourier.zero_fill(y)).astype(dtype)
    alphas = jnp.asarray(alphas, dtype)

    def step(z, inp):
        i, alpha = inp
        x = fourier.data_consistency(z, y, mask, 1.0 / (2.0 * alpha))
        x = x.astype(z.dtype)
        z_new = denoise(x, i).astype(z.dtype)
        if clamp:
            z_new = prox.clip01(z_new)
        out = None
        if collect_residuals:
            from pnp_admm_cnc_mri_tpu.parallel import reductions

            out = reductions.primal_residual_norm(x, z_new)
        return z_new, out

    z, res = jax.lax.scan(step, z0, (jnp.arange(iter_num), alphas))
    return z, res


def pnp_hqs(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    denoise: Callable,
    sigma255: float = 10.0,
    model_sigma1: float = 49.0,
    model_sigma2: float = 15.0,
    clamp: bool = True,
    dtype=jnp.float32,
    collect_residuals: bool = False,
):
    """DPIR-style PnP-HQS with the standard ladder.

    Builds the ``get_rho_sigma`` ladder (reference ``utils/utils_pnp.py:14``)
    from ``model_sigma1`` down to ``model_sigma2`` and runs :func:`run_hqs`
    with its ``rhos`` as the per-iteration data-solve weights. ``sigma255``
    scales the whole alpha ladder (DPIR's degradation-noise sigma on the
    [0,255] scale); the MRI observation noise has no single pixel-domain
    sigma, so this is a tuning knob (``config.TUNED_HQS_D``).

    NOTE: pass a denoiser built with the SAME ``(iter_num, model_sigma1,
    model_sigma2)`` so its internal sigma conditioning (DRUNet sigma-map /
    IRCNN bin schedule, ``priors/denoiser.build_denoiser``) walks the same
    ladder as the data solve — the coupling that makes DPIR work.
    """
    rhos, _sigmas = schedules.get_rho_sigma(
        sigma=sigma255 / 255.0,
        iter_num=iter_num,
        model_sigma1=model_sigma1,
        model_sigma2=model_sigma2,
    )
    return run_hqs(
        y, mask, iter_num, denoise, rhos, clamp=clamp, dtype=dtype,
        collect_residuals=collect_residuals,
    )
