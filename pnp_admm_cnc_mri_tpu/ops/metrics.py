"""Image quality metrics matching the reference bit-for-bit semantics.

PSNR / SSIM / RE are defined on the [0,255] scale with MATLAB-compatible
SSIM (11x11 Gaussian window, sigma=1.5, valid-region crop) — reference
``utils/utils_image.py:543-636``. Exact replication of these formulas is
what makes the 0.1 dB-parity claims meaningful.

All metrics are batched: inputs of shape (..., H, W) reduce over the
trailing two axes, so a whole sharded scenario grid is scored in one jitted
call (with ``psum``-able outputs for multi-host reporting).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax
import numpy as np


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, border: int = 0) -> jnp.ndarray:
    """PSNR on the [0,255] scale (reference ``utils_image.py:543-556``).

    ``border`` shaves a frame before scoring (the reference's ``border``
    argument; 0 in every published run).
    """
    if border:
        img1 = img1[..., border:-border, border:-border]
        img2 = img2[..., border:-border, border:-border]
    diff = img1.astype(jnp.float64) - img2.astype(jnp.float64)
    mse = jnp.mean(diff * diff, axis=(-2, -1))
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


def psnr_complex(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """The reference's second PSNR flavor, tolerant of complex inputs.

    ``util.psnr`` (reference ``utils/utils.py:12-17`` /
    ``utils_image.py:559-565``) uses ``|x - ref|^2`` so it accepts the
    complex zero-filled init (reference ``【1】ADMM_L1.py:101``).
    """
    diff = jnp.abs(x - ref)
    mse = jnp.mean(diff * diff, axis=(-2, -1))
    return 10.0 * jnp.log10(255.0**2 / mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """MATLAB/OpenCV-compatible normalized 2-D Gaussian window.

    Equals ``outer(k, k)`` for ``k = cv2.getGaussianKernel(11, 1.5)``
    (reference ``utils_image.py:600-601``).
    """
    half = (size - 1) / 2.0
    coords = np.arange(size, dtype=np.float64) - half
    k = np.exp(-(coords**2) / (2.0 * sigma**2))
    k /= k.sum()
    return np.outer(k, k)


def _filter2_valid(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Valid-region 2-D correlation over trailing axes, batched.

    The reference filters with reflected borders then crops ``[5:-5, 5:-5]``
    (reference ``utils_image.py:603-609``), which is exactly a VALID
    correlation — implemented as one grouped conv that XLA maps onto the
    MXU for the whole batch at once.
    """
    batch_shape = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, 1, h, w))
    k = window.reshape((1, 1, *window.shape)).astype(img.dtype)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), window_strides=(1, 1), padding="VALID"
    )
    return out.reshape(*batch_shape, *out.shape[-2:])


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, border: int = 0) -> jnp.ndarray:
    """MATLAB-compatible SSIM on [0,255] (reference ``utils_image.py:570-615``).

    C1=(0.01*255)^2, C2=(0.03*255)^2, 11x11 sigma=1.5 Gaussian window,
    statistics from valid windows only.
    """
    if border:
        img1 = img1[..., border:-border, border:-border]
        img2 = img2[..., border:-border, border:-border]
    img1 = img1.astype(jnp.float64)
    img2 = img2.astype(jnp.float64)
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    window = _gaussian_window(11, 1.5)

    mu1 = _filter2_valid(img1, window)
    mu2 = _filter2_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2_valid(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2_valid(img2 * img2, window) - mu2_sq
    sigma12 = _filter2_valid(img1 * img2, window) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map, axis=(-2, -1))


def relative_error(img1: jnp.ndarray, img2: jnp.ndarray, border: int = 0) -> jnp.ndarray:
    """Relative error ``||img2 - img1||_F / ||img2||_F``.

    Reference ``utils_image.py:622-636`` (``calculate_re``); note the
    asymmetry — ``img2`` is the ground truth.
    """
    if border:
        img1 = img1[..., border:-border, border:-border]
        img2 = img2[..., border:-border, border:-border]
    img1 = img1.astype(jnp.float64)
    img2 = img2.astype(jnp.float64)
    num = jnp.sqrt(jnp.sum((img2 - img1) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(img2**2, axis=(-2, -1)))
    return num / den


def all_metrics(recon01: jnp.ndarray, truth_uint: jnp.ndarray, border: int = 0):
    """Score a [0,1] reconstruction against a uint8-scale ground truth.

    The reference scores ``x*255`` against the uint8 image (reference
    ``【1】ADMM_L1.py:133-146``). Returns dict of batched psnr/ssim/re.
    """
    img_e = recon01 * 255.0
    return {
        "psnr": psnr(img_e, truth_uint, border),
        "ssim": ssim(img_e, truth_uint, border),
        "re": relative_error(img_e, truth_uint, border),
    }
