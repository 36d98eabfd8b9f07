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
    ".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG",
    ".ppm", ".PPM", ".bmp", ".BMP", ".tif",
)  # the reference's exact list (utils_image.py:22): uppercase variants
#    for all but .tif

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


def load_images_dir(
    dirpath: str, scale: int = 8, use_clip: bool = True
) -> tuple[List[np.ndarray], List[str]]:
    """Like :func:`load_testset` but returns a *list* of float [0,1]
    images, so directories of heterogeneous sizes (training corpora such
    as ``scripts/clean_corpus``) load without stacking."""
    paths = get_image_paths(dirpath)
    if not paths:
        raise FileNotFoundError(f"no images under {dirpath}")
    imgs, names = [], []
    for p in paths:
        u = modcrop(imread_gray(p), scale)
        f = uint2single(u)
        if use_clip:
            f = uint2single(single2uint(f))
        imgs.append(np.float64(f))
        names.append(os.path.splitext(os.path.basename(p))[0])
    return imgs, names


def imsave(img255: np.ndarray, path: str) -> None:
    """Save a [0,255] float image as PNG (reference ``utils_image.py:160-164``)."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, np.uint8(np.asarray(img255).clip(0, 255).round()))


def is_image_file(filename: str) -> bool:
    """Extension test (reference ``utils_image.py:25-26``)."""
    return filename.endswith(IMG_EXTENSIONS)


def imread_uint(path: str, n_channels: int = 3) -> np.ndarray:
    """Read as HxWx1 grayscale or HxWx3 RGB (gray replicated to GGG),
    reference ``utils_image.py:145-157``."""
    import cv2

    if n_channels == 1:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img[..., None]
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def uint162single(img: np.ndarray) -> np.ndarray:
    """uint16 -> [0,1] float32 (reference ``utils_image.py:189-190``)."""
    return np.float32(img / 65535.0)


def single2uint16(img: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint16 (reference ``utils_image.py:193-194``; the
    reference mistakenly casts to uint8 there — fixed here, deviation
    listed in PARITY.md)."""
    return np.uint16((np.asarray(img).clip(0, 1) * 65535.0).round())


def shave(img: np.ndarray, border: int = 0) -> np.ndarray:
    """Crop a ``border``-wide frame (reference ``utils_image.py:510-515``)."""
    h, w = img.shape[:2]
    return img[border:h - border, border:w - border]


def augment_img(img: np.ndarray, mode: int = 0) -> np.ndarray:
    """The 8-mode dihedral augmentation on HxW(xC) NumPy images
    (reference ``utils_image.py:315-331``; exact mode correspondence)."""
    if mode == 0:
        return img
    if mode == 1:
        return np.flipud(np.rot90(img))
    if mode == 2:
        return np.flipud(img)
    if mode == 3:
        return np.rot90(img, k=3)
    if mode == 4:
        return np.flipud(np.rot90(img, k=2))
    if mode == 5:
        return np.rot90(img)
    if mode == 6:
        return np.rot90(img, k=2)
    if mode == 7:
        return np.flipud(np.rot90(img, k=3))
    raise ValueError(f"mode must be 0..7, got {mode}")


# ---------------------------------------------------------------------------
# MATLAB-compatible YCbCr conversions (reference utils_image.py:427-516)
# ---------------------------------------------------------------------------

_Y_FROM_RGB = np.array([65.481, 128.553, 24.966])
_YCBCR_FROM_RGB = np.array([
    [65.481, -37.797, 112.0],
    [128.553, -74.203, -93.786],
    [24.966, 112.0, -18.214],
])
_RGB_FROM_YCBCR = np.array([
    [0.00456621, 0.00456621, 0.00456621],
    [0.0, -0.00153632, 0.00791071],
    [0.00625893, -0.00318811, 0.0],
])


def _ycbcr_common(img: np.ndarray, mat, offset):
    """Shared dtype plumbing of the reference converters: uint8 stays on
    the [0,255] scale and rounds; float operates on [0,1] and rescales.
    Unlike the reference, the input is never mutated in place (the
    reference's ``img *= 255.`` writes through to the caller's array — a
    side effect deliberately not replicated; PARITY.md)."""
    in_type = img.dtype
    x = np.asarray(img, np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    rlt = x @ mat + offset
    if in_type == np.uint8:
        rlt = rlt.round()
    else:
        rlt = rlt / 255.0
    return rlt.astype(in_type)


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """MATLAB ``rgb2ycbcr`` (reference ``utils_image.py:427-449``)."""
    if only_y:
        return _ycbcr_common(img, _Y_FROM_RGB / 255.0, 16.0)
    return _ycbcr_common(img, _YCBCR_FROM_RGB / 255.0,
                         np.array([16.0, 128.0, 128.0]))


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """BGR-ordered ``rgb2ycbcr`` (reference ``utils_image.py:471-493``)."""
    if only_y:
        return _ycbcr_common(img, _Y_FROM_RGB[::-1] / 255.0, 16.0)
    return _ycbcr_common(img, _YCBCR_FROM_RGB[::-1] / 255.0,
                         np.array([16.0, 128.0, 128.0]))


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """MATLAB ``ycbcr2rgb`` (reference ``utils_image.py:451-468``)."""
    return _ycbcr_common(img, _RGB_FROM_YCBCR * 255.0,
                         np.array([-222.921, 135.576, -276.836]))


def channel_convert(in_c: int, tar_type: str, img_list):
    """BGR / gray / y list conversion (reference ``utils_image.py:519-530``)."""
    import cv2

    if in_c == 3 and tar_type == "gray":
        return [cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[..., None]
                for img in img_list]
    if in_c == 3 and tar_type == "y":
        return [bgr2ycbcr(img, only_y=True)[..., None] for img in img_list]
    if in_c == 1 and tar_type == "RGB":
        return [cv2.cvtColor(img, cv2.COLOR_GRAY2BGR) for img in img_list]
    return img_list
