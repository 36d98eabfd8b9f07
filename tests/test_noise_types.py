"""All 10 experiment noise kernels vs the executed reference generator."""

import sys
import types

import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.data import noise as noise_mod
from tests.conftest import REFERENCE_DIR, requires_reference_data

ALL_TYPES = ["gw", "g0", "g1", "g2", "g3", "g4", "g1w", "g2w", "g3w", "g4w"]


@requires_reference_data
@pytest.mark.parametrize("noise_type", ALL_TYPES)
def test_kernel_matches_reference(noise_type):
    from pnp_admm_cnc_mri_tpu.priors.bm3d.transforms import wavedec_vector

    if "pywt" not in sys.modules:
        stub = types.ModuleType("pywt")
        stub.wavedec = lambda d, w, mode="periodization", level=None: wavedec_vector(
            np.asarray(d), w, level
        )
        sys.modules["pywt"] = stub
    sys.path.insert(0, REFERENCE_DIR)
    from utils import experiment_funcs as ref_ef

    # upstream helper uses the removed scipy.signal.gaussian API
    ref_ef.gaussian_kernel = noise_mod._gaussian_kernel

    want = ref_ef.get_experiment_kernel(noise_type, 0.02, np.array((64, 64)))
    got = noise_mod.get_experiment_kernel(noise_type, 0.02, np.array((64, 64)))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-12)


@requires_reference_data
def test_get_experiment_noise_quirk():
    """The reference helper returns the FIXED noises.mat x3 realization
    regardless of the requested type, plus the requested kernel's PSD."""
    noise, psd, kernel = noise_mod.get_experiment_noise("gw", 0.03, 0, (256, 256))
    np.testing.assert_array_equal(noise, noise_mod.load_noise())
    np.testing.assert_allclose(psd, np.full((256, 256), 0.03 * 256 * 256), rtol=1e-10)


def test_synth_colored_noise_spectrum():
    """Synthesized colored noise must follow the kernel's PSD shape."""
    kernel = noise_mod.get_experiment_kernel("g3", 0.01)
    n = noise_mod.synth_colored_noise((256, 256), kernel, seed=0)
    psd_emp = np.abs(np.fft.fft2(n)) ** 2
    psd_theory = np.abs(np.fft.fft2(kernel, (256, 256))) ** 2 * 256 * 256
    hot = psd_theory > 10 * psd_theory.mean()
    cold = psd_theory < 0.1 * psd_theory.mean()
    assert psd_emp[hot].mean() > 20 * psd_emp[cold].mean()
