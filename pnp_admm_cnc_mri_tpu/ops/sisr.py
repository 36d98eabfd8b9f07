"""Closed-form super-resolution / deblurring data solution (SISR).

Capability parity with the reference's vendored ``utils/utils_sisr.py``
(KAIR/DPIR; ``data_solution:243``, ``pre_calculate:255``), re-expressed
with native complex arrays instead of torch's real-pair rfft emulation
(the vendored code uses the long-removed ``torch.rfft`` API and cannot run
on modern torch at all).

Solves, in closed form per ADMM/HQS iteration,

    x* = argmin_x ||S H x - y||^2 + alpha ||x - z||^2

where H is circular convolution with kernel k and S the sf-fold
down-sampler (keep top-left pixel of each sf x sf block), using the
frequency-domain Woodbury identity over the sf x sf aliasing blocks.
Extends the framework beyond the MRI masked-FFT operator to the SR and
deblurring forward models of the DPIR family.
"""

from __future__ import annotations

import jax.numpy as jnp


def psf2otf(psf: jnp.ndarray, shape) -> jnp.ndarray:
    """Zero-pad the PSF to ``shape`` and circularly center it, then FFT
    (MATLAB ``psf2otf``; reference ``utils_sisr.psf2otf``)."""
    kh, kw = psf.shape[-2:]
    h, w = shape
    pad = jnp.zeros(psf.shape[:-2] + (h, w), psf.dtype)
    pad = pad.at[..., :kh, :kw].set(psf)
    pad = jnp.roll(pad, shift=(-(kh // 2), -(kw // 2)), axis=(-2, -1))
    return jnp.fft.fft2(pad, axes=(-2, -1))


def upsample_zeros(x: jnp.ndarray, sf: int) -> jnp.ndarray:
    """S^T: zero-insertion upsampling keeping the top-left position
    (reference ``utils_sisr.upsample``)."""
    h, w = x.shape[-2:]
    out = jnp.zeros(x.shape[:-2] + (h * sf, w * sf), x.dtype)
    return out.at[..., ::sf, ::sf].set(x)


def downsample(x: jnp.ndarray, sf: int) -> jnp.ndarray:
    """S: keep the top-left pixel of each sf x sf block."""
    return x[..., ::sf, ::sf]


def _block_mean(a: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Mean over the sf x sf aliasing blocks (reference ``splits`` +
    mean): (..., H, W) -> (..., H/sf, W/sf)."""
    h, w = a.shape[-2:]
    hs, ws = h // sf, w // sf
    a = a.reshape(a.shape[:-2] + (sf, hs, sf, ws))
    return jnp.mean(a, axis=(-4, -2))


def pre_calculate(y: jnp.ndarray, k: jnp.ndarray, sf: int):
    """Iteration-invariant spectra (reference ``pre_calculate:255``).

    y: (..., h, w) low-res observation; k: blur kernel (kh, kw).
    Returns (FB, FBC, F2B, FBFy) on the (h*sf, w*sf) HR grid.
    """
    h, w = y.shape[-2:]
    fb = psf2otf(jnp.asarray(k), (h * sf, w * sf))
    fbc = jnp.conj(fb)
    f2b = jnp.abs(fb) ** 2
    sty = upsample_zeros(y, sf)
    fbfy = fbc * jnp.fft.fft2(sty, axes=(-2, -1))
    return fb, fbc, f2b, fbfy


def data_solution(z, fb, fbc, f2b, fbfy, alpha, sf: int):
    """One closed-form x-update (reference ``data_solution:243``).

    z: (..., H, W) current estimate (prior output); alpha: scalar or
    broadcastable. Returns the real HR solution.
    """
    fr = fbfy + jnp.fft.fft2(alpha * z, axes=(-2, -1))
    x1 = fb * fr
    fbr = _block_mean(x1, sf)
    invw = _block_mean(f2b, sf)
    invwbr = fbr / (invw + alpha)
    fcb_invwbr = fbc * jnp.tile(invwbr, (1,) * (invwbr.ndim - 2) + (sf, sf))
    fx = (fr - fcb_invwbr) / alpha
    return jnp.real(jnp.fft.ifft2(fx, axes=(-2, -1)))
