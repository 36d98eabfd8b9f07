"""Tiling/test-mode wrappers vs the reference utils_model implementations."""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
sys.path.insert(0, REF)

if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: None
    tv.utils = tvu
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = tvu

from utils import utils_model as ref_um  # noqa: E402

from pnp_admm_cnc_mri_tpu.models import convert  # noqa: E402
from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN  # noqa: E402
from pnp_admm_cnc_mri_tpu.priors import denoiser as dn, tiling  # noqa: E402
import models.network_dncnn as ref_models  # noqa: E402


@pytest.fixture(scope="module")
def small_pair():
    tm = ref_models.DnCNN(in_nc=1, out_nc=1, nc=8, nb=4, act_mode="R").eval()
    params = convert.convert_dncnn(tm.state_dict(), nb=4)
    fm = DnCNN(out_nc=1, nc=8, nb=4)
    core = lambda x: fm.apply(params, x)
    return tm, core


@torch.no_grad()
def test_pad_mode_matches_reference(small_pair, rng):
    tm, core = small_pair
    x = rng.random((1, 1, 30, 27)).astype(np.float32)
    want = ref_um.test_mode(tm, torch.from_numpy(x), mode=1, modulo=16).numpy()
    got = tiling.pad_to_modulo(core, jnp.asarray(x.transpose(0, 2, 3, 1)), 16)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5
    )


@torch.no_grad()
def test_split_mode_matches_reference(small_pair, rng):
    tm, core = small_pair
    # big enough to force one split (min_size=16 -> 48x48 > 16^2)
    x = rng.random((1, 1, 48, 48)).astype(np.float32)
    want = ref_um.test_mode(
        tm, torch.from_numpy(x), mode=2, refield=8, min_size=16, modulo=1
    ).numpy()
    got = tiling.quad_split(
        core, jnp.asarray(x.transpose(0, 2, 3, 1)), refield=8, min_size=16, modulo=1
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5
    )


@torch.no_grad()
def test_split_mode_recursive_matches_reference(small_pair, rng):
    tm, core = small_pair
    # large enough to force recursion: h*w > 4*min_size^2
    x = rng.random((1, 1, 72, 72)).astype(np.float32)
    want = ref_um.test_mode(
        tm, torch.from_numpy(x), mode=2, refield=8, min_size=16, modulo=1
    ).numpy()
    got = tiling.quad_split(
        core, jnp.asarray(x.transpose(0, 2, 3, 1)), refield=8, min_size=16, modulo=1
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5
    )


@torch.no_grad()
def test_x8_ensemble_matches_reference(small_pair, rng):
    tm, core = small_pair
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    want = ref_um.test_mode(tm, torch.from_numpy(x), mode=3).numpy()

    got = dn.x8_ensemble(core, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5
    )


@torch.no_grad()
def test_onesplit_matches_reference(small_pair, rng):
    tm, core = small_pair
    x = rng.random((1, 1, 40, 40)).astype(np.float32)
    want = ref_um.test_onesplit(tm, torch.from_numpy(x), refield=8, min_size=16).numpy()
    got = tiling.one_split(core, jnp.asarray(x.transpose(0, 2, 3, 1)), refield=8)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5
    )


@torch.no_grad()
def test_split_x8_matches_reference(small_pair, rng):
    tm, core = small_pair
    # 48x48 > min_size^2 so every dihedral branch actually splits
    x = rng.random((1, 1, 48, 48)).astype(np.float32)
    want = ref_um.test_mode(
        tm, torch.from_numpy(x), mode=4, refield=8, min_size=16, modulo=1
    ).numpy()
    got = tiling.split_x8(
        core, jnp.asarray(x.transpose(0, 2, 3, 1)), refield=8, min_size=16, modulo=1
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5
    )
