"""Unit tests for core operators against NumPy oracles (SURVEY.md §4 tier 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.ops import fourier, metrics, prox, schedules
from tests import oracle


class TestFourier:
    def test_observe_matches_numpy(self, rng):
        img = rng.random((32, 32))
        mask = (rng.random((32, 32)) < 0.3).astype(np.float64)
        noise = rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))
        y = fourier.observe(jnp.asarray(img), jnp.asarray(mask), jnp.asarray(noise))
        y_np = np.fft.fft2(img) * mask + noise
        np.testing.assert_allclose(np.asarray(y), y_np, rtol=1e-12, atol=1e-12)

    def test_data_consistency_matches_index_assignment(self, rng):
        """The where-blend must equal the reference's index assignment."""
        img = rng.random((32, 32))
        mask = (rng.random((32, 32)) < 0.3).astype(np.float64)
        noise = 0.1 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
        y_np = np.fft.fft2(img) * mask + noise
        v = rng.random((32, 32))
        rho = 0.015

        # oracle: reference-style index assignment
        la2 = 1.0 / 2.0 / rho
        xf = np.fft.fft2(v)
        idx = np.nonzero(mask)
        xf[idx] = (la2 * xf[idx] + y_np[idx]) / (1.0 + la2)
        expected = np.abs(np.real(np.fft.ifft2(xf)))

        got = fourier.data_consistency(
            jnp.asarray(v), jnp.asarray(y_np), jnp.asarray(mask), rho
        )
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12, atol=1e-12)

    def test_data_consistency_batched(self, rng):
        imgs = rng.random((3, 16, 16))
        mask = (rng.random((16, 16)) < 0.4).astype(np.float64)
        noise = 0.1 * (rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16)))
        ys = np.fft.fft2(imgs, axes=(-2, -1)) * mask + noise
        out = fourier.data_consistency(
            jnp.asarray(imgs), jnp.asarray(ys), jnp.asarray(mask), 0.1
        )
        for i in range(3):
            single = fourier.data_consistency(
                jnp.asarray(imgs[i]), jnp.asarray(ys[i]), jnp.asarray(mask), 0.1
            )
            np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single),
                                       rtol=1e-12, atol=1e-12)


class TestProx:
    def test_soft_matches_reference(self, rng):
        x = rng.normal(size=(64,)) * 2
        for c in [0.0, 0.1, 1.5]:
            np.testing.assert_allclose(
                np.asarray(prox.soft(jnp.asarray(x), c)), oracle.soft(x, c), rtol=1e-15
            )

    def test_soft_at_zero(self):
        # np.sign(0) == 0: soft(0, c) must be exactly 0
        assert float(prox.soft(jnp.asarray(0.0), 0.5)) == 0.0

    def test_cnc_update_matches_reference_formula(self, rng):
        z = rng.normal(size=(16, 16))
        v = rng.normal(size=(16, 16))
        alpha, rho, lam, b = 0.45, 0.05, 0.5, 64.0
        s = oracle.soft(z, 1.0 / b)
        t = (1 - alpha) * z + alpha * v + alpha * rho * lam * b * (z - s)
        expected = oracle.soft(t, alpha * rho * lam)
        got = prox.cnc_update(jnp.asarray(z), jnp.asarray(v), alpha, rho, lam, b)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-14, atol=1e-15)


class TestSchedules:
    def test_rho_sigma_ladder(self):
        """Match the reference formula endpoints and the rho relation."""
        sigma = max(0.255 / 255.0, 15 / 255.0)
        rhos, sigmas = schedules.get_rho_sigma(
            sigma=sigma, iter_num=50, model_sigma1=49.0, model_sigma2=15.0
        )
        assert len(rhos) == len(sigmas) == 50
        np.testing.assert_allclose(sigmas[0], 49.0 / 255.0, rtol=1e-6)
        np.testing.assert_allclose(sigmas[-1], 15.0 / 255.0, rtol=1e-6)
        np.testing.assert_allclose(rhos, 0.23 * sigma**2 / sigmas.astype(np.float64) ** 2)
        # log-spaced: ratios constant
        ratios = sigmas[1:] / sigmas[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)

    def test_ircnn_indices(self):
        _, sigmas = schedules.get_rho_sigma(
            sigma=15 / 255.0, iter_num=50, model_sigma1=49.0, model_sigma2=15.0
        )
        idx = schedules.ircnn_sigma_indices(sigmas)
        expected = np.int32(np.ceil(sigmas.astype(np.float64) * 255.0 / 2.0) - 1)
        np.testing.assert_array_equal(idx, expected)
        assert idx.min() >= 0 and idx.max() <= 24


class TestMetrics:
    def test_psnr(self, rng):
        a = rng.random((64, 64)) * 255
        b = rng.random((64, 64)) * 255
        np.testing.assert_allclose(
            float(metrics.psnr(jnp.asarray(a), jnp.asarray(b))),
            oracle.psnr_numpy(a, b),
            rtol=1e-10,
        )

    def test_ssim_matches_cv2(self, rng):
        pytest.importorskip("cv2")
        a = rng.random((64, 64)) * 255
        b = np.clip(a + rng.normal(size=(64, 64)) * 20, 0, 255)
        ours = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = oracle.ssim_numpy(a, b)
        np.testing.assert_allclose(ours, ref, rtol=1e-8)

    def test_re(self, rng):
        a = rng.random((64, 64)) * 255
        b = rng.random((64, 64)) * 255
        np.testing.assert_allclose(
            float(metrics.relative_error(jnp.asarray(a), jnp.asarray(b))),
            oracle.re_numpy(a, b),
            rtol=1e-12,
        )

    def test_metrics_batched(self, rng):
        a = rng.random((4, 32, 32)) * 255
        b = rng.random((4, 32, 32)) * 255
        batched = metrics.psnr(jnp.asarray(a), jnp.asarray(b))
        assert batched.shape == (4,)
        for i in range(4):
            np.testing.assert_allclose(float(batched[i]), oracle.psnr_numpy(a[i], b[i]), rtol=1e-10)


class TestRFFTDataConsistency:
    @pytest.mark.parametrize("hw", [(32, 32), (33, 47), (32, 47), (33, 48)])
    def test_exact_vs_full_spectrum(self, hw, rng):
        """Half-spectrum solve must equal the full path to f64 precision,
        including odd sizes (Nyquist handling)."""
        h, w = hw
        v = rng.random((h, w))
        mask = (rng.random((h, w)) < 0.3).astype(np.float64)
        y = np.fft.fft2(rng.random((h, w))) * mask + (
            rng.normal(size=(h, w)) + 1j * rng.normal(size=(h, w))
        )
        want = np.asarray(
            fourier.data_consistency(jnp.asarray(v), jnp.asarray(y), jnp.asarray(mask), 0.015)
        )
        dc = fourier.make_rfft_data_consistency(jnp.asarray(y), jnp.asarray(mask), 0.015)
        got = np.asarray(dc(jnp.asarray(v)))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)

    def test_batched(self, rng):
        v = rng.random((3, 16, 16))
        mask = (rng.random((16, 16)) < 0.4).astype(np.float64)
        y = np.fft.fft2(rng.random((3, 16, 16)), axes=(-2, -1)) * mask + 0.5
        dc = fourier.make_rfft_data_consistency(jnp.asarray(y), jnp.asarray(mask), 0.1)
        got = dc(jnp.asarray(v))
        for i in range(3):
            single = fourier.data_consistency(
                jnp.asarray(v[i]), jnp.asarray(y[i]), jnp.asarray(mask), 0.1
            )
            # atol guards near-zero pixels: the half-spectrum path is the
            # same math reassociated, so f64 rounding can differ in the
            # last ulps of tiny values (seen order-dependently via the
            # session rng in full-suite runs)
            np.testing.assert_allclose(np.asarray(got[i]), np.asarray(single),
                                       rtol=1e-12, atol=1e-12)


class TestMatmulDFT:
    """MXU matmul DFT path: must match jnp.fft exactly (f64)."""

    @pytest.mark.parametrize("hw", [(32, 32), (33, 47), (32, 47), (33, 48)])
    def test_matmul_rfft2_matches_fft(self, hw, rng):
        h, w = hw
        x = jnp.asarray(rng.random((2, h, w)))
        yr, yi = fourier.matmul_rfft2(x)
        want = np.fft.rfft2(np.asarray(x), axes=(-2, -1))
        np.testing.assert_allclose(np.asarray(yr), want.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(yi), want.imag, atol=1e-9)

    @pytest.mark.parametrize("hw", [(32, 32), (33, 47), (32, 47), (33, 48)])
    def test_matmul_irfft2_roundtrip(self, hw, rng):
        h, w = hw
        x = rng.random((h, w))
        yr, yi = fourier.matmul_rfft2(jnp.asarray(x))
        back = fourier.matmul_irfft2(yr, yi, h, w)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-11)

    def test_dc_method_matmul_equals_fft(self, rng):
        h, w = 32, 48
        v = rng.random((h, w))
        mask = (rng.random((h, w)) < 0.3).astype(np.float64)
        y = np.fft.fft2(rng.random((h, w))) * mask + (
            rng.normal(size=(h, w)) + 1j * rng.normal(size=(h, w))
        )
        dc_f = fourier.make_rfft_data_consistency(jnp.asarray(y), jnp.asarray(mask), 0.015)
        dc_m = fourier.make_rfft_data_consistency(
            jnp.asarray(y), jnp.asarray(mask), 0.015, method="matmul")
        np.testing.assert_allclose(
            np.asarray(dc_m(jnp.asarray(v))), np.asarray(dc_f(jnp.asarray(v))),
            atol=1e-10)

    def test_admm_l1_dc_method_parity(self, rng):
        from pnp_admm_cnc_mri_tpu.config import ADMMConfig
        from pnp_admm_cnc_mri_tpu.solvers import admm

        mask = (rng.random((32, 32)) < 0.3).astype(np.float64)
        y = jnp.asarray(np.fft.fft2(rng.random((2, 32, 32)), axes=(-2, -1)) * mask)
        cfg = ADMMConfig(iter_num=8, lam=0.1, rho=0.015)
        a, _ = admm.admm_l1(y, jnp.asarray(mask), cfg, dtype=jnp.float64)
        b, _ = admm.admm_l1(y, jnp.asarray(mask), cfg, dtype=jnp.float64,
                            dc_method="matmul")
        np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x), atol=1e-9)

    @pytest.mark.parametrize("packed,k3", [(True, True), (True, False),
                                           (False, False)])
    def test_dc_packed_formulations_equal_fft(self, packed, k3, rng):
        """Nyquist-packed / Karatsuba matmul DC variants are exact.

        The packed path rides the Nyquist column in the sin-matrix DC
        slots (``fourier._packed_dc_mats``); all formulations are the
        same math reassociated, so f64 agreement must be ~machine eps.
        """
        h, w = 24, 32
        v = rng.random((3, h, w))
        mask = (rng.random((h, w)) < 0.3).astype(np.float64)
        y = np.fft.fft2(rng.random((h, w))) * mask + (
            rng.normal(size=(h, w)) + 1j * rng.normal(size=(h, w)))
        dc_f = fourier.make_rfft_data_consistency(
            jnp.asarray(y), jnp.asarray(mask), 0.015)
        old = fourier._MATMUL_PACKED, fourier._MATMUL_K3
        try:
            fourier._MATMUL_PACKED, fourier._MATMUL_K3 = packed, k3
            dc_m = fourier.make_rfft_data_consistency(
                jnp.asarray(y), jnp.asarray(mask), 0.015, method="matmul")
            got = np.asarray(dc_m(jnp.asarray(v)))
        finally:
            fourier._MATMUL_PACKED, fourier._MATMUL_K3 = old
        np.testing.assert_allclose(got, np.asarray(dc_f(jnp.asarray(v))),
                                   atol=1e-12)

    def test_dc_packed_odd_width_falls_back(self, rng):
        """Odd W has no Nyquist bin: with packing ENABLED the matmul path
        must route to the unpacked formulation and stay exact."""
        h, w = 24, 31
        v = rng.random((h, w))
        mask = (rng.random((h, w)) < 0.4).astype(np.float64)
        y = np.fft.fft2(rng.random((h, w))) * mask
        dc_f = fourier.make_rfft_data_consistency(
            jnp.asarray(y), jnp.asarray(mask), 0.1)
        old = fourier._MATMUL_PACKED
        try:
            fourier._MATMUL_PACKED = True
            dc_m = fourier.make_rfft_data_consistency(
                jnp.asarray(y), jnp.asarray(mask), 0.1, method="matmul")
            got = np.asarray(dc_m(jnp.asarray(v)))
        finally:
            fourier._MATMUL_PACKED = old
        np.testing.assert_allclose(got, np.asarray(dc_f(jnp.asarray(v))),
                                   atol=1e-12)

    def test_dc_packed_batched_masks(self, rng):
        """Leading mask/observation batch dims (the consensus layout)
        broadcast through the PACKED blend's column slices (toggle
        forced on — packing is measured-off by default)."""
        h, w = 16, 32
        masks = (rng.random((4, h, w)) < 0.3).astype(np.float64)
        y = np.fft.fft2(rng.random((h, w)))[None] * masks
        v = rng.random((4, h, w))
        dc_f = fourier.make_rfft_data_consistency(
            jnp.asarray(y), jnp.asarray(masks), 0.015)
        old = fourier._MATMUL_PACKED
        try:
            fourier._MATMUL_PACKED = True
            dc_m = fourier.make_rfft_data_consistency(
                jnp.asarray(y), jnp.asarray(masks), 0.015, method="matmul")
            got = np.asarray(dc_m(jnp.asarray(v)))
        finally:
            fourier._MATMUL_PACKED = old
        np.testing.assert_allclose(got, np.asarray(dc_f(jnp.asarray(v))),
                                   atol=1e-12)

    def test_matmul_rfft2_f32_accuracy(self, rng):
        """Phase reduction keeps the f32 path close to jnp.fft at f32
        (unreduced angles cost ~275x accuracy at 256x256)."""
        x32 = jnp.asarray(rng.random((256, 256)), jnp.float32)
        yr, yi = fourier.matmul_rfft2(x32)
        want = np.fft.rfft2(np.asarray(x32, np.float64))
        scale = np.abs(want).max()
        err_r = np.abs(np.asarray(yr, np.float64) - want.real).max() / scale
        err_i = np.abs(np.asarray(yi, np.float64) - want.imag).max() / scale
        assert err_r < 5e-7 and err_i < 5e-7, (err_r, err_i)
