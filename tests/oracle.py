"""Independent NumPy oracles re-deriving the reference math for parity tests.

These deliberately mirror the algorithm definitions in the reference
(``【1】ADMM_L1.py:111-126``, ``【4】ADMM_CNC .py:115-132``,
``utils/utils_image.py:543-636``) as straight-line NumPy so the JAX/TPU
implementations can be checked against a known-good fixed point, without
importing any reference code.
"""

from __future__ import annotations

import numpy as np


def soft(x, c):
    return np.fmax(np.fabs(x) - c, 0) * np.sign(x)


def admm_l1_numpy(img01: np.ndarray, mask: np.ndarray, noise: np.ndarray,
                  iter_num: int, lam: float, rho: float) -> np.ndarray:
    """Reference ADMM-L1 on one float64 image; returns the final x."""
    y = np.fft.fft2(img01) * mask + noise
    index = np.nonzero(mask)
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    la2 = 1.0 / 2.0 / rho
    for _ in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        z = soft(x + w, rho * lam)
        w = w + x - z
    return x


def admm_cnc_numpy(img01: np.ndarray, mask: np.ndarray, noise: np.ndarray,
                   iter_num: int, alpha: float, lam: float, rho: float,
                   b: float) -> np.ndarray:
    """Reference ADMM-CNC on one float64 image; returns the final x."""
    y = np.fft.fft2(img01) * mask + noise
    index = np.nonzero(mask)
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    la2 = 1.0 / 2.0 / rho
    for _ in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        s = soft(z, 1.0 / b)
        t = (1 - alpha) * z + alpha * (x + w) + alpha * rho * lam * b * (z - s)
        z = soft(t, alpha * rho * lam)
        w = w + x - z
    return x


def pnp_admm_l1_numpy(img01, mask, noise, iter_num, rho, denoise):
    """Reference PnP-ADMM-L1 skeleton with [0,1] clamping of x, z, w each
    iteration (the CNN-variant quirk, ``【3】:294-296``); ``denoise(v, i)``."""
    y = np.fft.fft2(img01) * mask + noise
    index = np.nonzero(mask)
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    la2 = 1.0 / 2.0 / rho
    for i in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        z = denoise(x + w, i)
        w = w + x - z
        x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)
    return x


def psnr_numpy(img1, img2, border=0):
    import math

    h, w = img1.shape[:2]
    img1 = img1[border : h - border, border : w - border].astype(np.float64)
    img2 = img2[border : h - border, border : w - border].astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    return 20 * math.log10(255.0 / math.sqrt(mse))


def ssim_numpy(img1, img2):
    """cv2-based MATLAB SSIM exactly as the reference computes it."""
    import cv2

    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def re_numpy(img1, img2):
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    return np.linalg.norm(img2 - img1) / np.linalg.norm(img2)
