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

import math

import jax.numpy as jnp
import numpy as np


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


def deblur_solution(z, f2b, fbfy, alpha):
    """Closed-form x-update for pure (sf=1) deblurring.

    With no decimation the Woodbury identity of :func:`data_solution`
    collapses to the diagonal frequency-domain Wiener-type solve

        Fx = (FBC*Fy + alpha*Fz) / (|FB|^2 + alpha)

    — the same solve DPIR's deblurring demo uses. Algebraically identical
    to ``data_solution(..., sf=1)`` (cross-tested); kept as a dedicated
    entry point because it avoids the block-split bookkeeping entirely.
    """
    fr = fbfy + alpha * jnp.fft.fft2(z, axes=(-2, -1))
    fx = fr / (f2b + alpha)
    return jnp.real(jnp.fft.ifft2(fx, axes=(-2, -1)))


def _block_sum(a: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Sum over the sf x sf aliasing blocks (reference ``BlockMM:50``) —
    the block mean scaled by the block count."""
    return _block_mean(a, sf) * (sf * sf)


def invls(fb, fbc, f2b, fr, tau, sf: int):
    """MATLAB-style closed-form solve (reference ``INVLS:66`` /
    ``BlockMM:50``), the Provable-PnP formulation of the same Woodbury
    identity as :func:`data_solution`.

    Uses block *sums* with denominator ``invW + tau*Nb`` — algebraically
    identical to the block-mean form with denominator ``invW_mean + tau``
    (``Nb = sf**2`` cancels). Kept as a distinct entry point for inventory
    parity; both paths are cross-tested.
    """
    nb = sf * sf
    x1 = fb * fr
    fbr = _block_sum(x1, sf)
    invw = _block_sum(f2b, sf)
    invwbr = fbr / (invw + tau * nb)
    fcb_invwbr = fbc * jnp.tile(invwbr, (1,) * (invwbr.ndim - 2) + (sf, sf))
    fx = (fr - fcb_invwbr) / tau
    return jnp.real(jnp.fft.ifft2(fx, axes=(-2, -1)))


# ---------------------------------------------------------------------------
# Circular (wrap) filtering and the G / G^T degradation pair
# ---------------------------------------------------------------------------


def wrap_convolve(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """True circular convolution with an odd-sized centered kernel.

    Equals ``scipy.ndimage.convolve(x, k, mode='wrap')`` (the reference's
    ``imfilter_np``, ``utils_sisr.py:397-403``) for odd kernels. Done in
    the Fourier domain so it fuses with surrounding spectral ops on TPU.
    """
    otf = psf2otf(jnp.asarray(k), x.shape[-2:])
    return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(x, axes=(-2, -1)) * otf,
                                  axes=(-2, -1)))


def wrap_correlate(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Circular cross-correlation (torch ``imfilter``: circular pad +
    ``conv2d``, which is correlation; ``utils_sisr.py:489-496``)."""
    otf = psf2otf(jnp.asarray(k), x.shape[-2:])
    return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(x, axes=(-2, -1))
                                  * jnp.conj(otf), axes=(-2, -1)))


def G(x: jnp.ndarray, k: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """Forward degradation: circular filter then sf-fold downsample
    (reference ``G``, ``utils_sisr.py:499-511``). Correlation semantics,
    matching the torch original; exact adjoint pairs require a symmetric
    kernel, same as the reference."""
    return downsample(wrap_correlate(x, k), sf)


def Gt(x: jnp.ndarray, k: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """Transpose direction: zero-insertion upsample then circular filter
    (reference ``Gt``, ``utils_sisr.py:514-526``)."""
    return wrap_correlate(upsample_zeros(x, sf), k)


def interpolation_down(x: jnp.ndarray, sf: int, center: bool = False):
    """Decimation observation triple (reference ``utils_sisr.py:529-543``).

    Returns ``(lr, y, mask)``: the kept samples, the zero-filled
    full-size image, and the sampling mask.
    """
    mask = jnp.zeros_like(x)
    start = (sf - 1) // 2 if center else 0
    mask = mask.at[..., start::sf, start::sf].set(1)
    lr = x[..., start::sf, start::sf]
    return lr, x * mask, mask


# ---------------------------------------------------------------------------
# Degradation models (SRMD / DPSR / classical; reference :550-628)
# ---------------------------------------------------------------------------


def bicubic_degradation(x: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """MATLAB-bicubic downscale (reference ``utils_sisr.py:550-560``).
    Batched ``(..., H, W)`` instead of the reference's HxWxC."""
    from . import resize

    return resize.imresize(x, 1.0 / sf)


def srmd_degradation(x: jnp.ndarray, k: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """Blur (circular) then bicubic downsample (reference
    ``utils_sisr.py:563-585``, SRMD degradation)."""
    return bicubic_degradation(wrap_convolve(x, k), sf)


def dpsr_degradation(x: jnp.ndarray, k: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """Bicubic downsample then blur (reference ``utils_sisr.py:588-610``,
    DPSR degradation)."""
    return wrap_convolve(bicubic_degradation(x, sf), k)


def classical_degradation(x: jnp.ndarray, k: jnp.ndarray, sf: int = 3) -> jnp.ndarray:
    """Blur (circular) then direct sf-fold decimation from position 0
    (reference ``utils_sisr.py:614-628``)."""
    return downsample(wrap_convolve(x, k), sf)


# ---------------------------------------------------------------------------
# Blur-kernel generators (host-side NumPy; reference :692-726, :819-880)
# ---------------------------------------------------------------------------


def gm_blur_kernel(mean, cov, size: int = 15) -> np.ndarray:
    """Gaussian-density blur kernel on the reference's off-by-half grid
    (``utils_sisr.py:714-724``: ``center = size/2 + 0.5``,
    ``c = idx - center + 1``), normalized to sum 1. Vectorized; the pdf
    normalization constant cancels in the final division."""
    center = size / 2.0 + 0.5
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    cy = yy - center + 1
    cx = xx - center + 1
    z = np.stack([cx - mean[0], cy - mean[1]], axis=-1)  # pdf([cx, cy])
    icov = np.linalg.inv(np.asarray(cov, np.float64))
    quad = np.einsum("...i,ij,...j->...", z, icov, z)
    k = np.exp(-0.5 * quad)
    return k / k.sum()


def anisotropic_gaussian(ksize: int = 15, theta: float = np.pi,
                         l1: float = 6.0, l2: float = 6.0) -> np.ndarray:
    """Anisotropic Gaussian kernel with eigenvalues ``l1 >= l2`` rotated by
    ``theta`` (reference ``anisotropic_Gaussian``,
    ``utils_sisr.py:692-711``: covariance ``V diag(l1,l2) V^{-1}`` with the
    reflection ``V = [[cos, sin],[sin, -cos]]``)."""
    v = np.array([math.cos(theta), math.sin(theta)])
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.diag([l1, l2])
    sigma = V @ D @ np.linalg.inv(V)
    return gm_blur_kernel(mean=[0.0, 0.0], cov=sigma, size=ksize)


def gen_kernel(k_size=(15, 15), scale_factor=(4, 4), min_var: float = 0.6,
               max_var: float = 10.0, noise_level: float = 0.0,
               rng: np.random.Generator | None = None) -> np.ndarray:
    """Random shifted anisotropic Gaussian kernel for blind-SR data
    generation (reference ``gen_kernel``, ``utils_sisr.py:819-880``; the
    BlindSR dataset generator recipe). Mean is shifted by
    ``-0.5*(sf-1)`` so the kernel aligns the downsampled grid."""
    rng = np.random.default_rng() if rng is None else rng
    k_size = np.asarray(k_size)
    scale_factor = np.asarray(scale_factor)
    lambda_1 = min_var + rng.random() * (max_var - min_var)
    lambda_2 = min_var + rng.random() * (max_var - min_var)
    theta = rng.random() * np.pi
    noise = -noise_level + rng.random(tuple(k_size)) * noise_level * 2

    LAM = np.diag([lambda_1, lambda_2])
    Q = np.array([[math.cos(theta), -math.sin(theta)],
                  [math.sin(theta), math.cos(theta)]])
    sigma = Q @ LAM @ Q.T
    inv_sigma = np.linalg.inv(sigma)

    mu = k_size // 2 - 0.5 * (scale_factor - 1)
    X, Y = np.meshgrid(np.arange(k_size[0]), np.arange(k_size[1]))
    zz = np.stack([X, Y], axis=-1).astype(np.float64) - mu  # (h, w, 2)
    quad = np.einsum("...i,ij,...j->...", zz, inv_sigma, zz)
    raw = np.exp(-0.5 * quad) * (1 + noise)
    return raw / raw.sum()


def _bilinear_grid_sample(img: np.ndarray, ys: np.ndarray,
                          xs: np.ndarray) -> np.ndarray:
    """Sample ``img`` on the separable grid ``ys x xs`` with bilinear
    interpolation, edge-clamped (scipy ``interp2d(..., kind='linear')``
    semantics on in-range points; the reference clips coordinates into
    range before calling it)."""
    ys = np.clip(ys, 0, img.shape[0] - 1)
    xs = np.clip(xs, 0, img.shape[1] - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, img.shape[0] - 1)
    x1 = np.minimum(x0 + 1, img.shape[1] - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return ((1 - wy) * ((1 - wx) * a + wx * b)
            + wy * ((1 - wx) * c + wx * d))


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """Half-grid pixel shift used to align SR kernels/images across scale
    factors (reference ``shift_pixel``, ``utils_sisr.py:782-812``):
    resample at coordinates shifted by ``(sf-1)/2``, clipped at borders."""
    x = np.asarray(x, np.float64)
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5 if upper_left else -(sf - 1) * 0.5
    xs = np.arange(w, dtype=np.float64) + shift
    ys = np.arange(h, dtype=np.float64) + shift
    if x.ndim == 2:
        return _bilinear_grid_sample(x, ys, xs)
    out = np.empty_like(x)
    for c in range(x.shape[-1]):
        out[..., c] = _bilinear_grid_sample(x[..., c], ys, xs)
    return out


def comp_upto_shift(i1: np.ndarray, i2: np.ndarray, maxshift: int = 5,
                    border: int = 15, min_interval: float = 0.25):
    """Shift-tolerant PSNR/SSIM (reference ``comp_upto_shift``,
    ``utils_sisr.py:636-688``): search sub-pixel translations of the
    estimate ``i1`` against the reference ``i2`` (SSD over a
    ``min_interval``-spaced grid in ``[-maxshift, maxshift]``), score the
    best alignment. Grayscale (H, W) on the [0,255] scale like the
    reference caller. Returns ``(psnr, ssim, (dy, dx))``."""
    from . import metrics

    i2c = np.asarray(i2, np.float64)[border:-border, border:-border]
    i1c = np.asarray(i1, np.float64)[border - maxshift:-border + maxshift,
                                     border - maxshift:-border + maxshift]
    n1, n2 = i2c.shape
    shifts = np.linspace(-maxshift, maxshift,
                         int(2 * maxshift / min_interval + 1))
    # i1c coordinate frame starts at -maxshift relative to i2c.
    base_y = np.arange(n1, dtype=np.float64) + maxshift
    base_x = np.arange(n2, dtype=np.float64) + maxshift
    best = (np.inf, 0.0, 0.0, None)
    for sy in shifts:
        for sx in shifts:
            t = _bilinear_grid_sample(i1c, base_y + sy, base_x + sx)
            ssd = float(np.sum((t - i2c) ** 2))
            if ssd < best[0]:
                best = (ssd, sy, sx, t)
    _, sy, sx, t = best
    p = float(metrics.psnr(jnp.asarray(t), jnp.asarray(i2c)))
    s = float(metrics.ssim(jnp.asarray(t), jnp.asarray(i2c)))
    return p, s, (sy, sx)


# ---------------------------------------------------------------------------
# PCA kernel-projection tooling (reference :734-779)
# ---------------------------------------------------------------------------


def get_pca_matrix(x: np.ndarray, dim_pca: int = 15) -> np.ndarray:
    """Top-``dim_pca`` eigenvector projection of a (d, N) kernel sample
    matrix (reference ``get_pca_matrix``, ``utils_sisr.py:734-747``)."""
    C = x @ x.T
    _, v = np.linalg.eigh(C)
    return v[:, -dim_pca:].T


def cal_pca_matrix(ksize: int = 15, l_max: float = 12.0, dim_pca: int = 15,
                   num_samples: int = 500,
                   rng: np.random.Generator | None = None) -> np.ndarray:
    """Sample random anisotropic Gaussians and compute their PCA projection
    (reference ``cal_pca_matrix``, ``utils_sisr.py:759-779``; column-major
    kernel flattening). Returns the (dim_pca, ksize**2) matrix instead of
    writing a .mat file."""
    rng = np.random.default_rng() if rng is None else rng
    kernels = np.zeros((ksize * ksize, num_samples), np.float64)
    for i in range(num_samples):
        theta = np.pi * rng.random()
        l1 = 0.1 + l_max * rng.random()
        l2 = 0.1 + (l1 - 0.1) * rng.random()
        kernels[:, i] = anisotropic_gaussian(ksize, theta, l1, l2).flatten(
            order="F")
    return get_pca_matrix(kernels, dim_pca=dim_pca)
