"""ctypes bindings to the native C++ runtime library (``native/``).

The native layer mirrors where the reference is native (its BM3D C
libraries) and adds the runtime pieces a production framework needs on the
host side: a multithreaded PNG batch loader, a MAT-v5 asset reader, exact
metrics, and a C++ BM3D core (CPU fallback / oracle). The TPU compute path
stays JAX/Pallas; this is the host runtime around it.

The library is built on demand with cmake+ninja into ``native/build``;
every entry point degrades gracefully (raises ``NativeUnavailable``) when
the toolchain or library is missing, and the pure-Python paths in
``data/`` / ``ops/metrics`` remain the portable default.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libpnpadmm_native.so")

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def build(force: bool = False) -> str:
    """Build the native library (cmake + ninja). Returns the .so path."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    subprocess.run(
        ["cmake", "-B", "build", "-G", "Ninja"], cwd=_NATIVE_DIR, check=True,
        capture_output=True,
    )
    subprocess.run(
        ["ninja", "-C", "build"], cwd=_NATIVE_DIR, check=True, capture_output=True
    )
    return _LIB_PATH


def lib(auto_build: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not auto_build:
            raise NativeUnavailable(f"{_LIB_PATH} not built")
        try:
            build()
        except Exception as e:  # toolchain missing
            raise NativeUnavailable(f"native build failed: {e}") from e
    l = ctypes.CDLL(_LIB_PATH)

    l.pnp_png_dims.argtypes = [ctypes.c_char_p, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    l.pnp_png_dims.restype = ctypes.c_int
    l.pnp_load_png_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    l.pnp_load_png_batch.restype = ctypes.c_int
    l.pnp_mat_var_info.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    l.pnp_mat_var_info.restype = ctypes.c_int
    l.pnp_mat_read_var.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_double),
                                   ctypes.POINTER(ctypes.c_double)]
    l.pnp_mat_read_var.restype = ctypes.c_int
    for name in ("pnp_psnr", "pnp_ssim", "pnp_re"):
        fn = getattr(l, name)
        fn.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                       ctypes.c_int, ctypes.c_int, ctypes.c_int]
        fn.restype = ctypes.c_double
    l.pnp_bm3d.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                           ctypes.c_float, ctypes.c_int, ctypes.c_int,
                           ctypes.POINTER(ctypes.c_float)]
    l.pnp_bm3d.restype = ctypes.c_int

    _lib = l
    return l


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def load_png_batch(
    paths: Sequence[str], modcrop: int = 8, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch load: returns (imgs01 float32 [0,1], imgs255 float32).

    All images must share the first image's post-modcrop size."""
    if not paths:
        raise ValueError("load_png_batch: empty path list")
    l = lib()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if l.pnp_png_dims(paths[0].encode(), modcrop, ctypes.byref(h), ctypes.byref(w)) != 0:
        raise FileNotFoundError(paths[0])
    n = len(paths)
    out01 = np.empty((n, h.value, w.value), np.float32)
    out255 = np.empty((n, h.value, w.value), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = l.pnp_load_png_batch(arr, n, h.value, w.value, modcrop, _fptr(out01),
                              _fptr(out255), n_threads)
    if rc != 0:
        raise IOError(
            f"failed to load {paths[rc - 1]} (decode error, or its "
            f"post-modcrop size differs from the first image's "
            f"{h.value}x{w.value})"
        )
    return out01, out255


def mat_read(path: str, name: str) -> np.ndarray:
    """Read a 2-D numeric variable from a MAT v5 file (real or complex)."""
    l = lib()
    r = ctypes.c_int()
    c = ctypes.c_int()
    cx = ctypes.c_int()
    if l.pnp_mat_var_info(path.encode(), name.encode(), ctypes.byref(r),
                          ctypes.byref(c), ctypes.byref(cx)) != 0:
        raise KeyError(f"{name} not found in {path}")
    re = np.empty((r.value, c.value), np.float64)
    im = np.empty((r.value, c.value), np.float64) if cx.value else None
    rc = l.pnp_mat_read_var(path.encode(), name.encode(), _dptr(re),
                            _dptr(im) if im is not None else None)
    if rc != 0:
        raise IOError(f"mat read failed ({rc}) for {name} in {path}")
    return re + 1j * im if im is not None else re


def _metric_pair(a, b):
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"native metrics take single (H, W) images, got "
                         f"{a.shape} vs {b.shape}; use ops.metrics for batches")
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return a, b


def psnr(a: np.ndarray, b: np.ndarray, border: int = 0) -> float:
    a, b = _metric_pair(a, b)
    return float(lib().pnp_psnr(_dptr(a), _dptr(b), a.shape[0], a.shape[1], border))


def ssim(a: np.ndarray, b: np.ndarray, border: int = 0) -> float:
    a, b = _metric_pair(a, b)
    return float(lib().pnp_ssim(_dptr(a), _dptr(b), a.shape[0], a.shape[1], border))


def relative_error(a: np.ndarray, b: np.ndarray, border: int = 0) -> float:
    a, b = _metric_pair(a, b)
    return float(lib().pnp_re(_dptr(a), _dptr(b), a.shape[0], a.shape[1], border))


def bm3d(z: np.ndarray, sigma: float, stages: str = "all", n_threads: int = 0) -> np.ndarray:
    """C++ BM3D (CPU fallback/oracle for the TPU path)."""
    if stages not in ("all", "ht"):
        raise ValueError(f"stages must be 'all' or 'ht', got {stages!r}")
    z = np.ascontiguousarray(z, np.float32)
    out = np.empty_like(z)
    rc = lib().pnp_bm3d(_fptr(z), z.shape[0], z.shape[1], float(sigma),
                        0 if stages == "ht" else 1, n_threads, _fptr(out))
    if rc != 0:
        raise ValueError(f"pnp_bm3d failed ({rc})")
    return out
