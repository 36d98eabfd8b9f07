"""K-space noise: the reference's fixed realization plus native synthesis.

The reference loads one fixed 256x256 complex128 noise field scaled x3
(``CS_MRI/noises.mat``, reference ``【1】ADMM_L1.py:185-186``) and, for the
BM3D variants, a white-noise PSD from ``get_experiment_noise('gw', 0.03,
0)`` (reference ``utils/experiment_funcs.py:94-127`` — which *ignores* the
generated noise and returns the fixed .mat realization, but still returns
the requested kernel's PSD, the quirk at ``:121-125``).
"""

from __future__ import annotations

import os

import numpy as np

from pnp_admm_cnc_mri_tpu.data.masks import DEFAULT_DATA_DIR


def load_noise(data_dir: str | None = None, scale: float = 3.0) -> np.ndarray:
    """The fixed complex noise realization, x3 as the reference loads it."""
    import scipy.io as sio

    data_dir = data_dir or DEFAULT_DATA_DIR
    mat = sio.loadmat(os.path.join(data_dir, "noises.mat"))
    return mat["noises"].astype(np.complex128) * scale


def synth_noise(
    shape: tuple[int, int], std: float = 10.0, seed: int = 0
) -> np.ndarray:
    """Circular complex Gaussian k-space noise (native generator)."""
    rng = np.random.default_rng(seed)
    re = rng.normal(0.0, std, shape)
    im = rng.normal(0.0, std, shape)
    return re + 1j * im


def white_noise_psd(shape: tuple[int, int], noise_var: float = 0.03) -> np.ndarray:
    """PSD of white Gaussian noise as the BM3D variants consume it.

    ``get_experiment_noise('gw', var, ...)`` builds a delta kernel of std
    sqrt(var) whose PSD is the constant ``var * H * W`` (reference
    ``utils/experiment_funcs.py:25-46, 125``).
    """
    h, w = shape
    return np.full(shape, noise_var * h * w, dtype=np.float64)
