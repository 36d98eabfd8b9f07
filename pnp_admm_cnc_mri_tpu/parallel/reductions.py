"""Cross-device convergence and metric reductions.

``psum``-based reductions over the ``data`` mesh axis give global
convergence statistics (converged fraction, mean residual, mean PSNR)
without gathering images to the host — the multi-chip analog of the
reference's per-image printed metrics (``【1】ADMM_L1.py:144-164``).

These helpers are written for use inside ``shard_map``/``pjit``-traced
functions where a mesh axis name is in scope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def global_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Mean over all shards of a per-shard mean."""
    return jax.lax.pmean(x, axis_name)


def global_sum(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    return jax.lax.psum(x, axis_name)


def converged_fraction(
    residuals: jnp.ndarray, tol: float, axis_name: str = "data"
) -> jnp.ndarray:
    """Fraction of batch elements with residual below tol, across shards.

    ``residuals``: per-element residual norms on this shard, shape (B_local,).
    """
    local_count = jnp.sum(residuals < tol).astype(jnp.float32)
    local_n = jnp.asarray(residuals.size, jnp.float32)
    total = jax.lax.psum(local_count, axis_name)
    n = jax.lax.psum(local_n, axis_name)
    return total / n


def primal_residual_norm(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Per-element ||x - z||_F over the trailing image axes."""
    return jnp.sqrt(jnp.sum((x - z) ** 2, axis=(-2, -1)))
