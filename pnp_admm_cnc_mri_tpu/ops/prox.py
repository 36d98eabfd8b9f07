"""Proximal / shrinkage operators for the classical priors.

The reference defines ``soft`` as ``fmax(|x|-c, 0) * sign(x)`` (reference
``【1】ADMM_L1.py:18-19``) and builds the CNC (convex-nonconvex / GMC)
regularizer out of two soft-threshold passes with a correction term
(reference ``【4】ADMM_CNC .py:126-129``). Both are pure pointwise maps, so
XLA fuses them into the surrounding iteration; a hand-written Pallas kernel
for the fully fused iteration tail lives in ``ops/pallas_kernels.py``.
"""

from __future__ import annotations

import jax.numpy as jnp


def soft(x: jnp.ndarray, c) -> jnp.ndarray:
    """Soft-threshold ``max(|x|-c, 0) * sign(x)``.

    Uses ``jnp.sign`` which maps 0 -> 0, matching ``np.sign`` in the
    reference (``【1】ADMM_L1.py:18-19``); the threshold ``c`` broadcasts, so
    per-scenario / per-iteration thresholds trace cleanly.
    """
    return jnp.maximum(jnp.abs(x) - c, 0.0) * jnp.sign(x)


def cnc_update(
    z: jnp.ndarray,
    v: jnp.ndarray,
    alpha,
    rho,
    lam,
    b,
) -> jnp.ndarray:
    """One CNC (GMC) z-update given ``v = x + w``.

    Reference ``【4】ADMM_CNC .py:126-129``:

        s = soft(z, 1/b)
        t = (1-alpha) z + alpha v + alpha rho lam b (z - s)
        z = soft(t, alpha rho lam)

    ``b`` here is the paper's ``b^2`` and ``rho`` the paper's ``1/beta``
    (reference ``【4】:40-41``).
    """
    s = soft(z, 1.0 / b)
    t = (1.0 - alpha) * z + alpha * v + alpha * rho * lam * b * (z - s)
    return soft(t, alpha * rho * lam)


def cnc_generalized_update(z, v, s, alpha, rho, lam, b, prox2):
    """CNC scheme with arbitrary operators in the two threshold slots.

    ``s`` is the output of the first operator applied to ``z`` and ``prox2``
    the second operator; used by the PnP-CNC variants where BM3D or a CNN
    denoiser replaces both soft-thresholds (reference
    ``【5】PNP_ADMM_CNC_BM3D .py:133-136``, ``【6】PNP_ADMM_CNC_D .py:300-302``).
    """
    t = (1.0 - alpha) * z + alpha * v + alpha * rho * lam * b * (z - s)
    return prox2(t)


def clip01(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 1].

    The CNN-prior variants clamp x, z AND the dual w each iteration when
    round-tripping to NumPy (reference ``【3】PNP_ADMM_L1_D  .py:294-296``) —
    a quirk that is numerically load-bearing for parity, reproduced here as
    an explicit opt-in op.
    """
    return jnp.clip(x, 0.0, 1.0)
