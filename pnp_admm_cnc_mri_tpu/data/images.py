"""Image I/O and conversion matching the reference's per-image pipeline.

Reference pipeline (``【1】ADMM_L1.py:85-90``): read PNG grayscale ->
``modcrop(·, 8)`` -> uint8 to [0,1] float -> uint8 clip round-trip
(``use_clip``). The clip round-trip is an identity on uint8-sourced data
but is kept for exactness; conversions mirror
``utils/utils_image.py:145-194``.
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

IMG_EXTENSIONS = (
    ".png", ".jpg", ".jpeg", ".bmp", ".tif", ".ppm",
    ".PNG", ".JPG", ".JPEG", ".BMP", ".TIF",
)  # reference utils_image.py:22 accepts both cases

DEFAULT_TESTSETS = os.environ.get("PNPADMM_TESTSETS", "/root/reference/testsets")


def get_image_paths(dirpath: str) -> List[str]:
    """Sorted image paths in a directory (reference ``utils_image.py:66-82``)."""
    paths = []
    for ext in IMG_EXTENSIONS:
        paths.extend(glob.glob(os.path.join(dirpath, f"*{ext}")))
    return sorted(paths)


def imread_gray(path: str) -> np.ndarray:
    """Read one image as uint8 grayscale (H, W).

    Reference ``imread_uint(path, n_channels=1)`` = ``cv2.imread(path, 0)``
    (``utils_image.py:145-151``).
    """
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def modcrop(img: np.ndarray, scale: int = 8) -> np.ndarray:
    """Crop H and W down to multiples of ``scale`` (``utils_image.py:495-508``)."""
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def uint2single(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float [0,1] (``utils_image.py:181-183``)."""
    return np.float32(img / 255.0)


def single2uint(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with clip+round (``utils_image.py:190-192``)."""
    return np.uint8((img.clip(0, 1) * 255.0).round())


def load_testset(
    dirpath: str, scale: int = 8, use_clip: bool = True
) -> tuple[np.ndarray, np.ndarray, List[str]]:
    """Load a testset directory as a batch.

    Returns ``(imgs01, imgs_uint, names)`` where ``imgs01`` is the float64
    [0,1] batch fed to the forward model and ``imgs_uint`` the uint8-scale
    ground truth used for metrics (reference keeps both, ``【1】:85-90``).
    ``use_clip`` applies the reference's uint8 clip round-trip.
    """
    paths = get_image_paths(dirpath)
    if not paths:
        raise FileNotFoundError(f"no images under {dirpath}")
    imgs, uints, names = [], [], []
    for p in paths:
        u = modcrop(imread_gray(p), scale)
        f = uint2single(u)
        if use_clip:
            f = uint2single(single2uint(f))
        imgs.append(np.float64(f))
        uints.append(u)
        names.append(os.path.splitext(os.path.basename(p))[0])
    return np.stack(imgs), np.stack(uints).astype(np.float64), names


def imsave(img255: np.ndarray, path: str) -> None:
    """Save a [0,255] float image as PNG (reference ``utils_image.py:160-164``)."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, np.uint8(np.asarray(img255).clip(0, 255).round()))
