"""Unrolled end-to-end training: differentiate through the PnP-FISTA solve.

New capability far beyond the reference (which ships no training at all,
SURVEY.md §5): instead of training the denoiser as a Gaussian-noise prior
and *hoping* it composes well with the solver, unroll the full FISTA
reconstruction (``solvers/fista.pnp_fista`` semantics, bit-compatible by
test) and train the denoiser parameters against the reconstruction MSE.
This is the standard deep-unrolling recipe (MoDL / VarNet family) that
typically buys 0.5-1.5 dB over plug-and-play with the same architecture —
and it is leakage-free by construction when the training images are the
synth stream + the disjoint clean corpus.

TPU design notes:
- the whole unroll is ONE ``lax.scan`` whose body is ``jax.checkpoint``-ed
  (rematerialization: backward recomputes each iteration's activations, so
  peak memory is one iteration instead of ``iter_num``);
- training images are synthesized/staged ON device; masks ride as a
  (M, H, W) stack indexed per-sample (all three reference masks — the
  unrolled net is trained for the problem family, not one mask);
- k-space noise is random Gaussian, per-component std matched to the
  reference's fixed field (``CS_MRI/noises.mat`` x3: std ~= 15 per
  component, ``【1】ADMM_L1.py:185-186``) and jittered so the net does not
  overfit one realization.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.ops import fourier, schedules
from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod


def make_drunet_ladder_denoise(model, iter_num: int, nlm255: float = 12.0,
                               model_sigma1: float = 15.0):
    """(params, u, i) -> denoised u for a sigma-map conditioned UNetRes,
    with the SAME ladder the eval pipeline builds
    (``priors/denoiser.build_denoiser`` drunet branch)."""
    _, sigmas = schedules.get_rho_sigma(
        sigma=max(0.255 / 255.0, nlm255 / 255.0), iter_num=iter_num,
        model_sigma1=model_sigma1, model_sigma2=nlm255,
    )
    sigmas = jnp.asarray(np.asarray(sigmas), jnp.float32)

    def denoise(params, u, i):
        x = u[..., None]
        sm = jnp.full_like(x, sigmas[i])
        out = model.apply(params, jnp.concatenate([x, sm], axis=-1))
        return out[..., 0]

    return denoise


def make_unrolled_recon(denoise: Callable, iter_num: int, step: float = 1.0,
                        remat: bool = True):
    """(params, y, mask) -> reconstruction, exactly the
    ``solvers/fista.pnp_fista`` iteration (clamp on, momentum on) with the
    parameters threaded through so it is differentiable end-to-end.
    Bit-compatibility with the eval solver is pinned in
    ``tests/test_unroll.py``."""

    def recon(params, y, mask):
        x0 = jnp.abs(fourier.zero_fill(y)).astype(jnp.float32)
        state = fista_mod.FISTAState(
            x=x0, v=x0, t=jnp.asarray(1.0, jnp.float32))

        def body(state, i):
            g = jnp.real(
                fourier.data_term_gradient(state.v, y, mask)
            ).astype(jnp.float32)
            z = denoise(params, state.v - step * g, i)
            x_new = jnp.clip(z, 0.0, 1.0).astype(jnp.float32)
            t_new, v_new = fista_mod.fista_extrapolate(state.x, x_new, state.t)
            return fista_mod.FISTAState(x=x_new, v=v_new, t=t_new), None

        body_fn = jax.checkpoint(body) if remat else body
        state, _ = jax.lax.scan(body_fn, state, jnp.arange(iter_num))
        return state.x

    return recon


def train_unrolled(
    model,
    recon_denoise: Callable,
    masks: np.ndarray,
    iter_num: int,
    generator: Optional[Callable] = None,
    real_images: Optional[np.ndarray] = None,
    steps: int = 1500,
    batch_size: int = 2,
    learning_rate: float = 2e-5,
    noise_std: float = 15.0,
    noise_jitter: float = 0.3,
    step: float = 1.0,
    params: Any = None,
    seed: int = 0,
    log_every: int = 20,
    ckpt_cb: Optional[Callable[[int, Any], None]] = None,
    ckpt_every: int = 0,
    ema_decay: Optional[float] = None,
    real_fraction: float = 0.5,
    lr_floor: float = 0.1,
    refresh_every: int = 500,
    buffer_images: int = 64,
) -> Tuple[Any, list]:
    """Train ``model`` through the unrolled FISTA solve.

    ``recon_denoise(params, u, i)``: the conditioned denoiser (e.g. from
    :func:`make_drunet_ladder_denoise`). ``masks``: (M, H, W) sampling
    masks, one drawn per sample. ``generator(key, n)`` synthesizes
    (n, H, W) clean images on device (``train/synth.py``);
    ``real_images`` (R, H, W) is staged once and mixed in at
    ``real_fraction``. Loss = MSE(recon, clean) on the [0,1] scale.
    """
    import optax

    from pnp_admm_cnc_mri_tpu.train.trainer import stage_to_device

    h, w = masks.shape[-2:]
    rng = jax.random.PRNGKey(seed)
    if params is None:
        dummy = jnp.zeros((1, h, w, 2), jnp.float32)
        params = model.init(rng, dummy)

    lr = optax.cosine_decay_schedule(learning_rate, steps, alpha=lr_floor)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = optimizer.init(params)

    recon = make_unrolled_recon(recon_denoise, iter_num, step=step)
    masks_d = jnp.asarray(masks, jnp.float32)
    n_masks = masks_d.shape[0]

    real_d = None
    if real_images is not None and len(real_images):
        real_d = stage_to_device(np.asarray(real_images, np.float32))

    def sample_batch(key, buffer, real):
        ks = jax.random.split(key, 4)
        idx = jax.random.randint(ks[0], (batch_size,), 0, buffer.shape[0])
        clean = buffer[idx]
        if real is not None:
            ridx = jax.random.randint(ks[1], (batch_size,), 0, real.shape[0])
            take_real = (jax.random.uniform(ks[2], (batch_size, 1, 1))
                         < real_fraction)
            clean = jnp.where(take_real, real[ridx], clean)
        midx = jax.random.randint(ks[3], (batch_size,), 0, n_masks)
        return clean, masks_d[midx]

    def loss_fn(params, clean, mk, key):
        k1, k2 = jax.random.split(key)
        scale = noise_std * (1.0 + noise_jitter * jax.random.uniform(
            k1, (batch_size, 1, 1), minval=-1.0, maxval=1.0))
        noise = scale * (
            jax.random.normal(k2, (2, batch_size, h, w), jnp.float32))
        y = (jnp.fft.fft2(clean, axes=(-2, -1)) * mk
             + noise[0] + 1j * noise[1]).astype(jnp.complex64)
        xr = recon(params, y, mk)
        return 0.5 * jnp.mean((xr - clean) ** 2)

    @jax.jit
    def train_step(params, opt_state, ema, buffer, real, key):
        k_s, k_n = jax.random.split(key)
        clean, mk = sample_batch(k_s, buffer, real)
        loss, grads = jax.value_and_grad(loss_fn)(params, clean, mk, k_n)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema,
                params)
        return params, opt_state, ema, loss

    key = jax.random.PRNGKey(seed + 1)
    if generator is not None:
        gen_jit = jax.jit(lambda k: generator(k, buffer_images))
        key, kb = jax.random.split(key)
        buffer = gen_jit(kb)
    else:
        assert real_d is not None, "need a generator or real images"
        buffer, real_d = real_d, None

    ema = params if ema_decay is not None else None
    out = lambda: ema if ema_decay is not None else params
    losses = []
    last_refresh = 0
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, ema, loss = train_step(
            params, opt_state, ema, buffer, real_d, sub)
        if i % log_every == 0 or i == steps - 1:
            losses.append((i, float(loss)))
        if (generator is not None and refresh_every
                and i - last_refresh >= refresh_every):
            key, kb = jax.random.split(key)
            buffer = gen_jit(kb)
            last_refresh = i
        if ckpt_cb is not None and ckpt_every and (i + 1) % ckpt_every == 0:
            ckpt_cb(i + 1, jax.device_get(out()))
    if ckpt_cb is not None:
        ckpt_cb(steps, jax.device_get(out()))
    return out(), losses
