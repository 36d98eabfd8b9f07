"""Per-iteration (rho, sigma) ladders for denoiser-prior scheduling.

Reference ``utils/utils_pnp.py:14-23`` (KAIR/DPIR): a log-spaced sigma
ladder from ``model_sigma1`` (49) down to ``model_sigma2`` with
``rho_i = 0.23 sigma^2 / sigma_i^2``. Used by the DRUNet and IRCNN priors
(reference ``【3】PNP_ADMM_L1_D  .py:165-167, 184-186``).
"""

from __future__ import annotations

import numpy as np


def get_rho_sigma(
    sigma: float = 2.55 / 255.0,
    iter_num: int = 15,
    model_sigma1: float = 49.0,
    model_sigma2: float = 2.55,
    w: float = 1.0,
):
    """Return ``(rhos, sigmas)`` arrays of length ``iter_num``.

    Matches the reference float32 intermediate computation exactly
    (``np.logspace(...).astype(np.float32)``) so IRCNN's per-iteration
    sigma-bin indices ``ceil(sigma_i*255/2)-1`` (reference ``【3】:281``)
    agree bit-for-bit with the reference.
    """
    model_sigmas = np.logspace(
        np.log10(model_sigma1), np.log10(model_sigma2), iter_num
    ).astype(np.float32)
    model_sigmas_lin = np.linspace(model_sigma1, model_sigma2, iter_num).astype(
        np.float32
    )
    sigmas = (model_sigmas * w + model_sigmas_lin * (1 - w)) / 255.0
    rhos = 0.23 * (sigma**2) / (sigmas.astype(np.float64) ** 2)
    return np.asarray(rhos), sigmas


def ircnn_sigma_indices(sigmas: np.ndarray) -> np.ndarray:
    """Map a sigma ladder to IRCNN's 25-way weight-bundle indices.

    Reference ``【3】PNP_ADMM_L1_D  .py:281``:
    ``current_idx = int(ceil(sigma_i * 255 / 2) - 1)``. The reference swaps
    torch state-dicts per iteration; the TPU build instead stacks all 25
    weight sets into one leading axis and gathers with these indices inside
    the scanned loop — zero host traffic.
    """
    idx = np.ceil(sigmas.astype(np.float64) * 255.0 / 2.0) - 1
    return np.clip(idx.astype(np.int32), 0, 24)
