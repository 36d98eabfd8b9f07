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


# ---------------------------------------------------------------------------
# Reference C BM3D as a golden oracle
# ---------------------------------------------------------------------------


def ensure_bm3d_scratch(scratch) -> None:
    """Patch a runnable copy of the reference bm3d307 package into
    ``scratch`` (idempotent). The vendored package needs environment fixes
    in this image: removed numpy aliases, scipy.signal.gaussian move,
    find_library not seeing the wheel-bundled OpenBLAS, missing pywt."""
    import os
    import re
    import shutil

    ref = "/root/reference"
    scratch = str(scratch)
    if not os.path.isdir(os.path.join(scratch, "bm3d307")):
        os.makedirs(scratch, exist_ok=True)
        shutil.copytree(os.path.join(ref, "bm3d307"),
                        os.path.join(scratch, "bm3d307"))
        import glob

        for py in glob.glob(os.path.join(scratch, "bm3d307", "bm3d", "*.py")):
            with open(py) as f:
                src = f.read()
            src = re.sub(r"np\.float\(", "float(", src)
            src = re.sub(r"np\.int\(", "int(", src)
            src = src.replace(
                'if platform == "linux" and find_library("openblas") is None:',
                "if False:",
            )
            src = src.replace("signal.gaussian(", "signal.windows.gaussian(")
            with open(py, "w") as f:
                f.write(src)
        with open(os.path.join(scratch, "pywt.py"), "w") as f:
            f.write(
                "import sys\n"
                "sys.path.insert(0, '/root/repo')\n"
                "from pnp_admm_cnc_mri_tpu.priors.bm3d.transforms import wavedec_vector\n"
                "def wavedec(data, wavelet, mode='periodization', level=None):\n"
                "    return wavedec_vector(data, wavelet, level)\n"
            )
    libdir = os.path.join(scratch, "libs")
    os.makedirs(libdir, exist_ok=True)
    cv = "/opt/venv/lib/python3.12/site-packages/opencv_python.libs"
    for name in os.listdir(cv):
        # openblas under the soname the reference dlopens, plus its
        # bundled dependencies (libgfortran etc.) under their own names
        dst = os.path.join(
            libdir, "libopenblas.so.0" if "openblas" in name else name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(cv, name), dst)


def run_oracle_bm3d(scratch, z: np.ndarray, psd_or_sigma, timeout: int = 600):
    """Run the reference C BM3D (two-stage, default profile) in a
    subprocess against ``z``; returns the estimate or None on failure.
    A subprocess is required because LD_LIBRARY_PATH only takes effect at
    process start."""
    import os
    import subprocess
    import sys as _sys

    scratch = str(scratch)
    ensure_bm3d_scratch(scratch)
    np.save(os.path.join(scratch, "oz.npy"), np.asarray(z, np.float64))
    if np.isscalar(psd_or_sigma):
        psd_arg = repr(float(psd_or_sigma))
    else:
        np.save(os.path.join(scratch, "op.npy"),
                np.asarray(psd_or_sigma, np.float64))
        psd_arg = f"np.load({os.path.join(scratch, 'op.npy')!r})"
    driver = (
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {scratch!r})\n"
        "from bm3d307.bm3d import bm3d\n"
        f"z = np.load({os.path.join(scratch, 'oz.npy')!r})\n"
        f"np.save({os.path.join(scratch, 'oy.npy')!r}, bm3d(z, {psd_arg}))\n"
    )
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = ":".join([
        os.path.join(scratch, "libs"),
        "/opt/venv/lib/python3.12/site-packages/opencv_python.libs",
        env.get("LD_LIBRARY_PATH", ""),
    ])
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run([_sys.executable, "-c", driver], env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        return None
    return np.load(os.path.join(scratch, "oy.npy"))
