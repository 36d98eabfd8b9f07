"""Consensus ADMM: one global regularization state shared across shards.

New capability with no reference counterpart (SURVEY.md §2.5): jointly
reconstruct ONE image from N observations through different sampling masks
(or noise realizations), with per-observation data-consistency solves and a
single shared auxiliary z:

    x_i <- DC_i(z - w_i)            (local, per shard)
    z   <- prox( mean_i(x_i + w_i) )  (global; pmean over the mesh axis)
    w_i <- w_i + x_i - z

On a mesh the mean is one ``lax.pmean`` over ICI; everything else is
shard-local. Plain batched (single-device) semantics are the same program
with the mean over the leading axis.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.ops import fourier, prox


def run_consensus(
    ys: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: ADMMConfig,
    z_prox: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    dtype=jnp.float32,
    dc_method: str = "auto",
):
    """Batched consensus solve: ``ys``/``masks`` have a leading axis of N
    observations of the same image. Returns (z, per-obs x).

    ``z_prox(v, i)`` defaults to the L1 soft-threshold with cfg.rho*cfg.lam.
    ``dc_method`` as in ``solvers.admm.run_admm``: 'auto' picks the MXU
    DFT-as-matmul data-consistency solve on accelerators and the FFT
    kernel on CPU (same math; see ``fourier.resolve_dc_method``).
    """
    if z_prox is None:
        z_prox = lambda v, i: prox.soft(v, cfg.rho * cfg.lam)

    x0 = jnp.abs(fourier.zero_fill(ys)).astype(dtype)
    z0 = jnp.mean(x0, axis=0)
    w0 = jnp.zeros_like(x0)
    dc = fourier.make_rfft_data_consistency(
        ys, masks, cfg.rho, method=fourier.resolve_dc_method(dc_method, ys))

    def step(carry, i):
        z, w = carry
        x = dc(z[None] - w).astype(dtype)
        v = jnp.mean(x + w, axis=0)
        z_new = z_prox(v, i)
        w_new = w + x - z_new[None]
        return (z_new, w_new), None

    (z, w), _ = jax.lax.scan(step, (z0, w0), jnp.arange(cfg.iter_num))
    x = dc(z[None] - w).astype(dtype)
    return z, x


def run_consensus_sharded(
    ys: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: ADMMConfig,
    mesh: Mesh,
    axis: str = "data",
    dtype=jnp.float32,
    z_prox=None,
    dc_method: str = "auto",
):
    """shard_map version: each device owns a slice of the observations; the
    consensus mean is a ``lax.pmean`` collective over the mesh axis.
    ``z_prox(v, i)`` is pluggable like in ``run_consensus`` (defaults to the
    L1 soft-threshold); ``dc_method`` as in ``run_consensus``."""
    if z_prox is None:
        z_prox = lambda v, i: prox.soft(v, cfg.rho * cfg.lam)
    dc_method = fourier.resolve_dc_method(dc_method, ys)

    def local_solve(ys_l, masks_l):
        x0 = jnp.abs(fourier.zero_fill(ys_l)).astype(dtype)
        # global init: mean of |A^H y| across ALL shards
        z0 = jax.lax.pmean(jnp.mean(x0, axis=0), axis)
        w0 = jnp.zeros_like(x0)
        dc = fourier.make_rfft_data_consistency(
            ys_l, masks_l, cfg.rho, method=dc_method)

        def step(carry, i):
            z, w = carry
            x = dc(z[None] - w).astype(dtype)
            v = jax.lax.pmean(jnp.mean(x + w, axis=0), axis)
            z_new = z_prox(v, i)
            w_new = w + x - z_new[None]
            return (z_new, w_new), None

        (z, w), _ = jax.lax.scan(step, (z0, w0), jnp.arange(cfg.iter_num))
        return z

    f = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    ys_d = jax.device_put(ys, NamedSharding(mesh, P(axis)))
    masks_d = jax.device_put(masks, NamedSharding(mesh, P(axis)))
    return f(ys_d, masks_d)
