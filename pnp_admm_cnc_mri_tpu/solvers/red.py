"""RED — Regularization by Denoising (Romano, Elad & Milanfar, SIAM J.
Imaging Sci. 2017) — gradient-form PnP, one jitted ``lax.scan``.

Fourth MRI solver family beside ADMM (``solvers/admm.py``), FISTA
(``solvers/fista.py``) and HQS (``solvers/hqs.py``). Where PnP replaces a
proximal operator with a denoiser, RED builds an *explicit* regularizer
from one,

    R(x) = (lam/2) x^T (x - D(x)),

whose gradient is ``lam (x - D(x))`` under RED's local-homogeneity /
Jacobian-symmetry conditions — so plain first-order methods apply:

    x_{k+1} = x_k - mu [ grad f(x_k) + lam (x_k - D(x_k)) ]        (RED-GD)

with ``f(x) = ||M F x - y||^2 / (2N)`` (gradient = the reference's unused
``Df`` helper, ``utils/utils.py:50-55`` -> ``fourier.data_term_gradient``;
Lipschitz constant exactly 1), and the RED fixed-point iteration

    x_{k+1} = (1/(1+mu lam)) [ x_k - mu grad f(x_k) + mu lam D(x_k) ]

(RED-FP, the paper's "fixed-point" variant — an implicit gradient step on
the regularizer, unconditionally stable in lam). No reference counterpart;
this family is the framework's answer to gradient-only forward models
where neither the prox (FISTA) nor the quadratic sub-problem (ADMM/HQS)
is convenient — for the MRI model all four families coexist and are
cross-comparable on the same scenarios (``TUNED_RED_D``).

Conventions as everywhere: trailing (H, W) axes, arbitrary leading batch
axes, ``denoise(u, i)`` with the iteration index.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.ops import fourier, prox


def run_red(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    iter_num: int,
    denoise: Callable,
    lam: float = 0.2,
    step: float = 1.0,
    variant: str = "fp",
    clamp: bool = True,
    dtype=jnp.float32,
    collect_residuals: bool = False,
):
    """Run ``iter_num`` RED iterations as one ``lax.scan``.

    ``variant='gd'`` is explicit gradient descent (stable for
    ``step <= 2/(1 + lam)`` by the usual smooth-descent bound with
    L_f = 1); ``'fp'`` is the fixed-point form — implicit in the
    regularizer, so large ``lam`` cannot overshoot (the denoised image
    enters as a convex combination). Zero-filled magnitude init like
    every solver here (reference ``【1】ADMM_L1.py:100-105``).

    Returns ``(x_final, residuals)`` — residuals (if requested) is the
    per-iteration denoiser residual norm ``||x - D(x)||_F`` per batch
    element, RED's natural convergence signal (psum-able like the ADMM
    primal residual).
    """
    if variant not in ("gd", "fp"):
        raise ValueError(f"unknown RED variant {variant!r} (want 'gd' or 'fp')")
    x0 = jnp.abs(fourier.zero_fill(y)).astype(dtype)

    def iteration(x, i):
        g = jnp.real(fourier.data_term_gradient(x, y, mask)).astype(dtype)
        dx = denoise(x, i).astype(dtype)
        if variant == "gd":
            x_new = x - step * (g + lam * (x - dx))
        else:
            x_new = (x - step * g + step * lam * dx) / (1.0 + step * lam)
        if clamp:
            x_new = prox.clip01(x_new)
        out = None
        if collect_residuals:
            from pnp_admm_cnc_mri_tpu.parallel import reductions

            out = reductions.primal_residual_norm(x, dx)
        return x_new, out

    x, res = jax.lax.scan(iteration, x0, jnp.arange(iter_num))
    return x, res
