"""Transform matrices for BM3D: DCT, Haar, bior1.5, Kaiser windows.

The reference generates these via scipy/pywt with hardcoded 8x8
MATLAB-compatible matrices for bior1.5/dst (reference
``bm3d307/bm3d/__init__.py:466-630``). Here everything is built from the
standard definitions:

- DCT-II with orthonormal scaling.
- Dyadic periodized wavelet analysis matrices from filter taps (the pywt
  ``wavedec(mode='periodization')`` construction), full decomposition,
  row order [cA_L, cD_L, ..., cD_1]; validated in tests against the
  reference's hardcoded bior1.5 8x8 matrix.
- Forward transforms are row-normalized to unit l2 norm (except 8x8
  bior1.5, kept unnormalized exactly like the reference ``:615-620``);
  inverses are matrix inverses, so biorthogonal pairs reconstruct
  perfectly.
- 2D Kaiser aggregation window, beta=2.0 (reference ``profiles.py:58``).
"""

from __future__ import annotations

import numpy as np

# Standard biorthogonal 1.5 analysis filters (reversed-for-convolution pywt
# convention): 5 vanishing analysis moments lowpass, Haar-like highpass.
_BIOR15_DEC_LO = np.array(
    [
        0.01657281518405971,
        -0.01657281518405971,
        -0.12153397801643787,
        0.12153397801643787,
        0.7071067811865476,
        0.7071067811865476,
        0.12153397801643787,
        -0.12153397801643787,
        -0.01657281518405971,
        0.01657281518405971,
    ]
)
_BIOR15_DEC_HI = np.array(
    [0.0, 0.0, 0.0, 0.0, -0.7071067811865476, 0.7071067811865476, 0.0, 0.0, 0.0, 0.0]
)

_HAAR_DEC_LO = np.array([0.7071067811865476, 0.7071067811865476])
_HAAR_DEC_HI = np.array([-0.7071067811865476, 0.7071067811865476])

# The 8x8 bior1.5 analysis matrix is a MATLAB-compatibility TABLE in the
# algorithm spec, not a derivable construction: the reference hardcodes
# it (``bm3d307/bm3d/__init__.py:491-504``, "kept for matlab
# compatibility") and the C binaries consume exactly these values. Our
# pywt-convention generator produces the same subband structure but with
# the d2/d1 rows phase-rolled and the coarse rows scaled ~2.9% (MATLAB's
# wavedec normalization) — measured as the prime suspect for the A2
# endpoint-cloud low-shift (VERDICT r3 #4), so the exact table is used at
# (8, 'bior1.5') like the reference does, and the generator covers every
# other size.
_BIOR15_8x8_MATLAB = np.array([
    [0.343550200747110, 0.343550200747110, 0.343550200747110,
     0.343550200747110, 0.343550200747110, 0.343550200747110,
     0.343550200747110, 0.343550200747110],
    [-0.225454819240296, -0.461645582253923, -0.461645582253923,
     -0.225454819240296, 0.225454819240296, 0.461645582253923,
     0.461645582253923, 0.225454819240296],
    [0.569359398342840, 0.402347308162280, -0.402347308162280,
     -0.569359398342840, -0.083506045090280, 0.083506045090280,
     -0.083506045090280, 0.083506045090280],
    [-0.083506045090280, 0.083506045090280, -0.083506045090280,
     0.083506045090280, 0.569359398342840, 0.402347308162280,
     -0.402347308162280, -0.569359398342840],
    [0.707106781186550, -0.707106781186550, 0, 0, 0, 0, 0, 0],
    [0, 0, 0.707106781186550, -0.707106781186550, 0, 0, 0, 0],
    [0, 0, 0, 0, 0.707106781186550, -0.707106781186550, 0, 0],
    [0, 0, 0, 0, 0, 0, 0.707106781186550, -0.707106781186550],
])

FILTERS = {
    "bior1.5": (_BIOR15_DEC_LO, _BIOR15_DEC_HI),
    "haar": (_HAAR_DEC_LO, _HAAR_DEC_HI),
}


def _analysis_step(x: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """One periodized analysis level: c[k] = sum_t f[t] x[(2k+1-t) mod m]."""
    m = x.shape[0]
    ks = np.arange(m // 2)
    idx = (2 * ks[:, None] + 1 - np.arange(lo.size)[None, :]) % m
    ca = (x[idx] * lo[None, :]).sum(axis=1)
    cd = (x[idx] * hi[None, :]).sum(axis=1)
    return ca, cd


def wavedec_vector(x: np.ndarray, wavelet: str, level: int | None = None):
    """Full periodized wavedec of a 1-D signal: [cA_L, cD_L, ..., cD_1]."""
    lo, hi = FILTERS[wavelet]
    n = x.shape[0]
    if level is None:
        level = int(np.log2(n))
    ca = x.astype(np.float64)
    details = []
    for _ in range(level):
        ca, cd = _analysis_step(ca, lo, hi)
        details.append(cd)
    return [ca] + details[::-1]


def wavelet_matrix(n: int, wavelet: str) -> np.ndarray:
    """Analysis matrix W (n x n): W @ x == hstack(wavedec_vector(x))."""
    w = np.zeros((n, n))
    for i in range(n):
        delta = np.zeros(n)
        delta[i] = 1.0
        w[:, i] = np.hstack(wavedec_vector(delta, wavelet))
    return w


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix."""
    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * t + 1) / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def dst_matrix(n: int) -> np.ndarray:
    """Orthonormal DST-II matrix (reference ``__init__.py:589-590``:
    ``scipy.fftpack.dst(eye, norm='ortho')``, used by the 'deb' profile)."""
    from scipy.fftpack import dst

    return dst(np.eye(n), norm="ortho")


def transform_pair(
    n: int, kind: str, dec_level: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """(forward, inverse) transform matrices with reference normalization.

    Forward rows are scaled to unit l2 norm — EXCEPT the 8x8 bior1.5 matrix
    which the reference keeps in raw MATLAB-compatible scaling (reference
    ``__init__.py:615-620``). Inverse = inv(forward).

    ``dec_level`` replicates the reference's ``profiles.py:67`` field for
    generated wavelet matrices: at ``__init__.py:608`` the impulse used to
    build column ``ii`` is ``np.roll(temp, (ii, dec_levels))``, which NumPy
    evaluates as a single shift of ``ii + dec_levels`` — i.e. the full-
    decomposition analysis matrix with its columns cyclically advanced.
    The reference's *hardcoded* matrices (8x8 bior1.5/dct/dst) bypass that
    branch entirely, so dec_level is a no-op there — including for the
    'high' profile at its default 8x8 block size — and we reproduce that.
    """
    if n == 1:
        return np.ones((1, 1)), np.ones((1, 1))
    if kind == "bior1.5" and n == 8:
        t = _BIOR15_8x8_MATLAB
        return t, np.linalg.inv(t)
    if kind == "dct":
        t = dct_matrix(n)
    elif kind == "dst":
        t = dst_matrix(n)
    elif kind in FILTERS:
        # (the 8x8 bior1.5 hardcoded table already returned above, so every
        # generated wavelet matrix takes the dec_level + normalization path)
        t = wavelet_matrix(n, kind)
        if dec_level:
            t = np.roll(t, -int(dec_level), axis=1)
        norms = np.sqrt((t**2).sum(axis=1))
        t = t / norms[:, None]
    else:
        raise ValueError(kind)
    return t, np.linalg.inv(t)


def stack_transforms(max_size: int, kind: str = "haar"):
    """(forward, inverse) 3rd-dimension transforms for sizes 1,2,4,...,max.

    The reference precomputes per-size stack transforms for every power of
    2 up to the max 3D group size (``_get_transforms``); same here.
    """
    fwd, inv = {}, {}
    s = 1
    while s <= max_size:
        f, i = transform_pair(s, kind)
        fwd[s], inv[s] = f, i
        s *= 2
    return fwd, inv


def kaiser_window(n: int = 8, beta: float = 2.0) -> np.ndarray:
    """2-D separable Kaiser aggregation window (reference ``:944-962``)."""
    k = np.kaiser(n, beta)
    return np.outer(k, k)
