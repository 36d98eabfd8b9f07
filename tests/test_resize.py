"""MATLAB-bicubic resize + data-term gradient vs reference implementations."""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
sys.path.insert(0, REF)

from pnp_admm_cnc_mri_tpu.ops import fourier, resize  # noqa: E402


def _ref_imresize():
    torch = pytest.importorskip("torch")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    from utils import utils_image as ref_util

    return torch, ref_util


@pytest.mark.parametrize("scale", [0.5, 0.25, 2.0, 1.5, 0.75])
def test_imresize_matches_reference(scale, rng):
    torch, ref_util = _ref_imresize()
    img = rng.random((32, 32)).astype(np.float32)
    want = ref_util.imresize(torch.from_numpy(img.copy()), scale).numpy()
    got = np.asarray(resize.imresize(jnp.asarray(img), scale))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_imresize_batched(rng):
    imgs = rng.random((3, 16, 16)).astype(np.float32)
    out = resize.imresize(jnp.asarray(imgs), 0.5)
    assert out.shape == (3, 8, 8)
    single = resize.imresize(jnp.asarray(imgs[0]), 0.5)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), rtol=1e-6)


def test_data_term_gradient_matches_reference(rng):
    """fourier.data_term_gradient vs the reference Df (utils/utils.py:50-55)."""
    x = rng.random((24, 24))
    mask = (rng.random((24, 24)) < 0.3).astype(np.float64)
    noise = rng.normal(size=(24, 24)) + 1j * rng.normal(size=(24, 24))
    y = np.fft.fft2(rng.random((24, 24))) * mask + noise

    res = np.fft.fft2(x) * mask
    index = np.nonzero(mask)
    res[index] = res[index] - y[index]
    want = np.fft.ifft2(res)

    got = fourier.data_term_gradient(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)
