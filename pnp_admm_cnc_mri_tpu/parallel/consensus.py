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


def consensus_admm_step(z, w, dc, z_prox, i, dtype):
    """One batched consensus-ADMM iteration (shared by ``run_consensus``
    and ``utils.checkpoint.resume_consensus_admm`` so resume semantics
    cannot desynchronize from the solver).

    Axis convention (round 4): the observation axis is ``-3`` — a single
    consensus problem is (N, H, W) as before, and any leading axes are
    independent problems (a batch of images, each with its own N
    observations), so the whole testset solves as ONE program that fills
    the chip like the single-mask batched solvers."""
    x = dc(z[..., None, :, :] - w).astype(dtype)
    v = jnp.mean(x + w, axis=-3)
    z_new = z_prox(v, i)
    w_new = w + x - z_new[..., None, :, :]
    return z_new, w_new


def run_consensus(
    ys: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: ADMMConfig,
    z_prox: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    dtype=jnp.float32,
    dc_method: str = "auto",
    return_state: bool = False,
):
    """Batched consensus solve: ``ys``/``masks`` have a leading axis of N
    observations of the same image. Returns (z, per-obs x), or
    (z, x, w) with ``return_state=True`` (the per-observation duals —
    what ``utils.checkpoint.save_consensus_state`` snapshots).

    ``z_prox(v, i)`` defaults to the L1 soft-threshold with cfg.rho*cfg.lam.
    ``dc_method`` as in ``solvers.admm.run_admm``: 'auto' picks the MXU
    DFT-as-matmul data-consistency solve on accelerators and the FFT
    kernel on CPU (same math; see ``fourier.resolve_dc_method``).
    """
    if z_prox is None:
        z_prox = lambda v, i: prox.soft(v, cfg.rho * cfg.lam)

    x0 = jnp.abs(fourier.zero_fill(ys)).astype(dtype)
    z0 = jnp.mean(x0, axis=-3)
    w0 = jnp.zeros_like(x0)
    dc = fourier.make_rfft_data_consistency(
        ys, masks, cfg.rho, method=fourier.resolve_dc_method(dc_method, ys))

    def step(carry, i):
        z, w = carry
        return consensus_admm_step(z, w, dc, z_prox, i, dtype), None

    (z, w), _ = jax.lax.scan(step, (z0, w0), jnp.arange(cfg.iter_num))
    x = dc(z[..., None, :, :] - w).astype(dtype)
    if return_state:
        return z, x, w
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


def consensus_fista_iteration(state, i, m, ysz, cnt, prox_fn, step, dtype):
    """One batched consensus-FISTA iteration (shared by
    ``run_consensus_fista`` and ``utils.checkpoint.resume_consensus_fista``
    so resume semantics cannot desynchronize from the solver)."""
    from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod

    vf = fourier.fft2(state.v)
    res = jnp.sum(m * vf[..., None, :, :] - ysz * m, axis=-3) / cnt
    g = jnp.real(fourier.ifft2(res)).astype(dtype)
    x_new = prox_fn(i, state.v - step * g).astype(dtype)
    t_new, v_new = fista_mod.fista_extrapolate(state.x, x_new, state.t)
    return fista_mod.FISTAState(x=x_new, v=v_new, t=t_new)


def consensus_fista_setup(ys, masks, precondition: bool):
    """Precompute the (mask indicator, zeroed data, per-frequency count)
    triple consumed by :func:`consensus_fista_iteration`."""
    m = (masks != 0).astype(ys.real.dtype)
    if precondition:
        cnt = jnp.maximum(jnp.sum(m, axis=-3), 1.0)
    else:
        cnt = jnp.asarray(float(masks.shape[-3]), ys.real.dtype)
    ysz = jnp.where(m != 0, ys, 0.0)
    return m, ysz, cnt


def run_consensus_fista(
    ys: jnp.ndarray,
    masks: jnp.ndarray,
    iter_num: int,
    prox_fn,
    step: float = 1.0,
    dtype=jnp.float32,
    precondition: bool = True,
    return_state: bool = False,
):
    """Multi-observation FISTA: ONE iterate, a fused gradient over all
    observations.

    The gradient form makes multi-mask fusion trivial — no per-obs dual
    states. With ``precondition=True`` (default) the summed k-space
    residual is divided per-frequency by the sampling count
    ``c(k) = sum_i m_i(k)``, which turns the normal operator into an
    ORTHOGONAL PROJECTION onto the mask UNION (Lipschitz exactly 1, full
    step on every covered frequency; at step=1 the gradient step becomes
    "replace every union frequency with the mask-averaged observation").
    The unpreconditioned mean gradient (precondition=False) under-steps
    frequencies covered by few masks and measured ~0.1-0.3 dB worse —
    and any step > 1 DIVERGES because the masks share the k-space
    center, where the mean operator's norm is 1.

    ``prox_fn(i, u) -> u`` as in ``solvers.fista.run_fista``.
    ys/masks: (N, H, W) observations of one image. With
    ``return_state=True`` the full ``FISTAState`` (x, v, momentum t) is
    returned instead of just x — what
    ``utils.checkpoint.save_consensus_fista`` snapshots.
    """
    from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod

    m, ysz, cnt = consensus_fista_setup(ys, masks, precondition)

    x0 = jnp.mean(jnp.abs(fourier.zero_fill(ysz)), axis=-3).astype(dtype)
    state = fista_mod.FISTAState(x=x0, v=x0, t=jnp.asarray(1.0, dtype))

    def iteration(state, i):
        return consensus_fista_iteration(
            state, i, m, ysz, cnt, prox_fn, step, dtype), None

    state, _ = jax.lax.scan(iteration, state, jnp.arange(iter_num))
    if return_state:
        return state
    return state.x


def consensus_hqs_step(z, i, alpha, S, cnt, denoise, clamp, dtype):
    """One consensus-HQS iteration given the one-time reductions ``S``
    (summed masked k-space data) and ``cnt`` (per-frequency sampling
    count). Shared by ``run_consensus_hqs``, ``run_consensus_hqs_sharded``
    and ``utils.checkpoint.resume_consensus_hqs`` so resume semantics
    cannot desynchronize from the solver."""
    zf = fourier.fft2(z)
    xf = (S + alpha * zf) / (cnt + alpha)
    x = jnp.abs(jnp.real(fourier.ifft2(xf))).astype(dtype)
    z_new = denoise(x, i).astype(dtype)
    if clamp:
        z_new = prox.clip01(z_new)
    return z_new


def run_consensus_hqs(
    ys: jnp.ndarray,
    masks: jnp.ndarray,
    iter_num: int,
    denoise: Callable,
    sigma255: float = 10.0,
    model_sigma1: float = 49.0,
    model_sigma2: float = 15.0,
    clamp: bool = True,
    dtype=jnp.float32,
    alphas=None,
):
    """Multi-observation HQS: ONE iterate, an EXACT joint data solve.

    The HQS x-subproblem over N masked-FFT observations,

        argmin_x  sum_i ||M_i F x - y_i||^2 + alpha_k ||x - z_k||^2,

    stays diagonal in k-space — per frequency ``k`` with sampling count
    ``c(k) = sum_i m_i(k)`` and summed data ``S(k) = sum_i m_i y_i(k)``:

        Xf(k) = (S(k) + alpha_k Zf(k)) / (c(k) + alpha_k),

    which reduces exactly to the single-mask ladder solve of
    ``solvers.hqs.run_hqs`` at ``c = 1`` (reference convention
    ``【1】ADMM_L1.py:115-120`` with ``La2 = alpha``) and to ``Zf`` at
    uncovered frequencies. Unlike consensus-ADMM (per-obs duals + pmean
    every iteration) or consensus-FISTA (fused-gradient psum every
    iteration), the joint quadratic here is solved EXACTLY with no
    per-observation state at all — ``S`` and ``c`` are reductions computed
    ONCE, so the sharded variant needs a single setup ``psum`` and the
    iteration loop is collective-free.

    ``denoise(u, i)`` as everywhere; the ``get_rho_sigma`` ladder
    (reference ``utils/utils_pnp.py:14``) drives ``alpha_k`` and should
    also condition the denoiser (build it with the same ladder params).
    ``alphas`` overrides the built ladder (length must equal
    ``iter_num``; used by checkpoint/resume). ys/masks: (N, H, W)
    observations of one image.
    """
    from pnp_admm_cnc_mri_tpu.ops import schedules

    m = (masks != 0).astype(ys.real.dtype)
    cnt = jnp.sum(m, axis=-3)
    S = jnp.sum(jnp.where(m != 0, ys, 0.0), axis=-3)

    if alphas is None:
        alphas, _sigmas = schedules.get_rho_sigma(
            sigma=sigma255 / 255.0, iter_num=iter_num,
            model_sigma1=model_sigma1, model_sigma2=model_sigma2)
    alphas = jnp.asarray(alphas, dtype)

    # union-averaged zero-fill init: |ifft2(S / c)| — at N=1 this is the
    # reference's |ifft2(y)| on the masked observation, so the solver
    # reduces EXACTLY to solvers.hqs.run_hqs (tests/test_consensus.py)
    z0 = jnp.abs(fourier.ifft2(S / jnp.maximum(cnt, 1.0))).astype(dtype)

    def step(z, inp):
        i, alpha = inp
        return consensus_hqs_step(z, i, alpha, S, cnt, denoise, clamp, dtype), None

    z, _ = jax.lax.scan(step, z0, (jnp.arange(iter_num), alphas))
    return z


def run_consensus_hqs_sharded(
    ys: jnp.ndarray,
    masks: jnp.ndarray,
    iter_num: int,
    denoise: Callable,
    mesh: Mesh,
    axis: str = "data",
    sigma255: float = 10.0,
    model_sigma1: float = 49.0,
    model_sigma2: float = 15.0,
    clamp: bool = True,
    dtype=jnp.float32,
    alphas=None,
):
    """shard_map version of :func:`run_consensus_hqs`: each device owns a
    slice of the observations, the summed k-space data ``S`` and sampling
    count ``c`` are ``lax.psum``'d ONCE at setup, and the iteration loop
    runs replicated with zero per-iteration collectives — the cheapest
    collective budget of the three consensus families.

    ``alphas`` overrides the built ladder exactly as in the batched
    variant (length must equal ``iter_num``; used by checkpoint/resume)."""
    from pnp_admm_cnc_mri_tpu.ops import schedules

    if alphas is None:
        alphas, _sigmas = schedules.get_rho_sigma(
            sigma=sigma255 / 255.0, iter_num=iter_num,
            model_sigma1=model_sigma1, model_sigma2=model_sigma2)

    def local_solve(ys_l, masks_l):
        m_l = (masks_l != 0).astype(ys_l.real.dtype)
        cnt = jax.lax.psum(jnp.sum(m_l, axis=0), axis)
        ysz = jnp.where(m_l != 0, ys_l, 0.0)
        S = jax.lax.psum(jnp.sum(ysz, axis=0), axis)
        z0 = jnp.abs(fourier.ifft2(S / jnp.maximum(cnt, 1.0))).astype(dtype)
        al = jnp.asarray(alphas, dtype)

        def step(z, inp):
            i, alpha = inp
            return consensus_hqs_step(
                z, i, alpha, S, cnt, denoise, clamp, dtype), None

        z, _ = jax.lax.scan(step, z0, (jnp.arange(iter_num), al))
        return z

    f = jax.shard_map(
        local_solve, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P()
    )
    ys_d = jax.device_put(ys, NamedSharding(mesh, P(axis)))
    masks_d = jax.device_put(masks, NamedSharding(mesh, P(axis)))
    return f(ys_d, masks_d)


def run_consensus_fista_sharded(
    ys: jnp.ndarray,
    masks: jnp.ndarray,
    iter_num: int,
    prox_fn,
    mesh: Mesh,
    axis: str = "data",
    step: float = 1.0,
    dtype=jnp.float32,
    precondition: bool = True,
):
    """shard_map version of ``run_consensus_fista``: each device owns a
    slice of the observations; the fused k-space residual is one
    ``lax.psum`` over ICI per iteration (same collective budget as
    consensus ADMM). The per-frequency sampling count is psum'd once at
    setup."""
    from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod

    n_total = float(masks.shape[0])

    def local_solve(ys_l, masks_l):
        m_l = (masks_l != 0).astype(ys_l.real.dtype)
        if precondition:
            cnt = jnp.maximum(jax.lax.psum(jnp.sum(m_l, axis=0), axis), 1.0)
        else:
            cnt = jnp.asarray(n_total, ys_l.real.dtype)
        ysz = jnp.where(m_l != 0, ys_l, 0.0)
        x0 = jax.lax.pmean(
            jnp.mean(jnp.abs(fourier.zero_fill(ysz)), axis=0), axis
        ).astype(dtype)
        state = fista_mod.FISTAState(x=x0, v=x0, t=jnp.asarray(1.0, dtype))

        def iteration(state, i):
            vf = fourier.fft2(state.v)
            res_l = jnp.sum(m_l * vf[None] - ysz * m_l, axis=0)
            res = jax.lax.psum(res_l, axis) / cnt
            g = jnp.real(fourier.ifft2(res)).astype(dtype)
            x_new = prox_fn(i, state.v - step * g).astype(dtype)
            t_new, v_new = fista_mod.fista_extrapolate(state.x, x_new, state.t)
            return fista_mod.FISTAState(x=x_new, v=v_new, t=t_new), None

        state, _ = jax.lax.scan(iteration, state, jnp.arange(iter_num))
        return state.x

    f = jax.shard_map(
        local_solve, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P()
    )
    ys_d = jax.device_put(ys, NamedSharding(mesh, P(axis)))
    masks_d = jax.device_put(masks, NamedSharding(mesh, P(axis)))
    return f(ys_d, masks_d)
