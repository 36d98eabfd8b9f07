"""Native C++ runtime library: loader/MAT/metrics/BM3D parity with Python."""

import glob
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference_data

native_rt = pytest.importorskip("pnp_admm_cnc_mri_tpu.native_rt")

try:
    native_rt.lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


@requires_reference_data
class TestLoader:
    def test_batch_matches_cv2_pipeline(self):
        from pnp_admm_cnc_mri_tpu.data import images

        paths = sorted(glob.glob(os.path.join(REFERENCE_DIR, "testsets/set/*.png")))
        b01, b255 = native_rt.load_png_batch(paths)
        ref01, ref255, _ = images.load_testset(os.path.join(REFERENCE_DIR, "testsets/set"))
        # the testset mixes real PNG, BMP and JPEG payloads; all must decode
        # bit-exactly as cv2.imread(path, 0) does
        np.testing.assert_array_equal(b01, ref01.astype(np.float32))
        np.testing.assert_array_equal(b255, ref255.astype(np.float32))

    def test_missing_file_errors(self):
        with pytest.raises(FileNotFoundError):
            native_rt.load_png_batch(["/nonexistent/x.png"])


@requires_reference_data
class TestMatReader:
    def test_masks_match_scipy(self):
        from pnp_admm_cnc_mri_tpu.data import masks

        for name in ("Q_Random30", "Q_Radial30", "Q_Cartesian30"):
            m = native_rt.mat_read(
                os.path.join(REFERENCE_DIR, f"CS_MRI/{name}.mat"), "Q1"
            )
            np.testing.assert_array_equal(m, masks.load_mask(name))

    def test_complex_noise_matches_scipy(self):
        from pnp_admm_cnc_mri_tpu.data import noise

        n = native_rt.mat_read(os.path.join(REFERENCE_DIR, "CS_MRI/noises.mat"), "noises")
        np.testing.assert_allclose(n * 3.0, noise.load_noise(), rtol=0, atol=1e-12)

    def test_unknown_var(self):
        with pytest.raises(KeyError):
            native_rt.mat_read(
                os.path.join(REFERENCE_DIR, "CS_MRI/noises.mat"), "nope"
            )


class TestMetrics:
    def test_match_jax_metrics(self, rng):
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.ops import metrics

        a = rng.random((48, 48)) * 255
        b = rng.random((48, 48)) * 255
        assert abs(native_rt.psnr(a, b) - float(metrics.psnr(jnp.asarray(a), jnp.asarray(b)))) < 1e-10
        assert abs(native_rt.ssim(a, b) - float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))) < 1e-10
        assert abs(
            native_rt.relative_error(a, b)
            - float(metrics.relative_error(jnp.asarray(a), jnp.asarray(b)))
        ) < 1e-12


class TestNativeBM3D:
    def test_matches_jax_bm3d(self, rng):
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.priors.bm3d import core

        xx, yy = np.meshgrid(np.arange(48), np.arange(48))
        x = 0.5 + 0.3 * np.sin(xx / 6.0) * np.cos(yy / 9.0)
        sigma = 0.1
        z = (x + sigma * rng.standard_normal((48, 48))).astype(np.float32)

        yc = native_rt.bm3d(z, sigma)
        yj = np.asarray(core.bm3d(jnp.asarray(z), sigma))
        # same algorithm, different arithmetic order: near-identical output
        mse = np.mean((yc - yj) ** 2)
        assert mse < 1e-6, mse

    def test_ht_only(self, rng):
        z = (0.5 + 0.05 * rng.standard_normal((48, 48))).astype(np.float32)
        y = native_rt.bm3d(z, 0.05, stages="ht")
        assert np.abs(y - 0.5).mean() < np.abs(z - 0.5).mean()

    def test_too_small_image_errors(self):
        with pytest.raises(ValueError):
            native_rt.bm3d(np.zeros((16, 16), np.float32), 0.1)
