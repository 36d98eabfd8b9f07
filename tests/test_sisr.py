"""Closed-form SR data solution vs an explicit least-squares oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.ops import sisr


def _circ_blur_matrix(k: np.ndarray, h: int, w: int) -> np.ndarray:
    """Dense matrix of circular CONVOLUTION with centered kernel k
    (out[r] = sum_i k[i] x[r - i + center])."""
    n = h * w
    m = np.zeros((n, n))
    kh, kw = k.shape
    for r in range(h):
        for c in range(w):
            for i in range(kh):
                for j in range(kw):
                    rr = (r - (i - kh // 2)) % h
                    cc = (c - (j - kw // 2)) % w
                    m[r * w + c, rr * w + cc] += k[i, j]
    return m


class TestSISR:
    def test_psf2otf_matches_scipy_convention(self, rng):
        from scipy import fft as sfft

        k = rng.random((3, 3))
        otf = np.asarray(sisr.psf2otf(jnp.asarray(k), (8, 8)))
        # applying the OTF must equal circular convolution with centered k
        x = rng.random((8, 8))
        got = np.real(np.fft.ifft2(np.fft.fft2(x) * otf))
        want = (_circ_blur_matrix(k, 8, 8) @ x.ravel()).reshape(8, 8)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("sf", [1, 2, 4])
    def test_data_solution_solves_least_squares(self, sf, rng):
        """The closed form must equal the direct solve of
        (H^T S^T S H + alpha I) x = H^T S^T y + alpha z."""
        h_lr = 4
        hh = h_lr * sf
        k = rng.random((3, 3))
        k /= k.sum()
        alpha = 0.37

        bmat = _circ_blur_matrix(k, hh, hh)
        sel = np.zeros((h_lr * h_lr, hh * hh))
        for r in range(h_lr):
            for c in range(h_lr):
                sel[r * h_lr + c, (r * sf) * hh + c * sf] = 1.0
        a_full = sel @ bmat  # SH

        x_true = rng.random((hh, hh))
        y = (a_full @ x_true.ravel()).reshape(h_lr, h_lr)
        z = rng.random((hh, hh))

        lhs = a_full.T @ a_full + alpha * np.eye(hh * hh)
        rhs = a_full.T @ y.ravel() + alpha * z.ravel()
        want = np.linalg.solve(lhs, rhs).reshape(hh, hh)

        fb, fbc, f2b, fbfy = sisr.pre_calculate(jnp.asarray(y), jnp.asarray(k), sf)
        got = np.asarray(sisr.data_solution(jnp.asarray(z), fb, fbc, f2b, fbfy, alpha, sf))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    def test_deblur_solution_is_data_solution_sf1(self, rng):
        """The dedicated sf=1 deblurring solve and the general Woodbury
        form collapse to the same answer."""
        k = rng.random((3, 3))
        k /= k.sum()
        y = jnp.asarray(rng.random((2, 8, 8)))
        z = jnp.asarray(rng.random((2, 8, 8)))
        alpha = 0.42
        fb, fbc, f2b, fbfy = sisr.pre_calculate(y, jnp.asarray(k), 1)
        got = np.asarray(sisr.deblur_solution(z, f2b, fbfy, alpha))
        want = np.asarray(sisr.data_solution(z, fb, fbc, f2b, fbfy, alpha, 1))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_upsample_downsample_adjoint(self, rng):
        """S and S^T must be adjoint: <Sx, y> == <x, S^T y>."""
        x = jnp.asarray(rng.random((8, 8)))
        y = jnp.asarray(rng.random((4, 4)))
        lhs = float(jnp.sum(sisr.downsample(x, 2) * y))
        rhs = float(jnp.sum(x * sisr.upsample_zeros(y, 2)))
        assert abs(lhs - rhs) < 1e-12

    @pytest.mark.parametrize("sf", [2, 3])
    def test_invls_matches_data_solution(self, sf, rng):
        """The block-sum INVLS formulation and the block-mean data_solution
        are the same Woodbury identity."""
        h_lr = 4
        k = rng.random((3, 3))
        k /= k.sum()
        y = jnp.asarray(rng.random((h_lr, h_lr)))
        z = jnp.asarray(rng.random((h_lr * sf, h_lr * sf)))
        tau = 0.21
        fb, fbc, f2b, fbfy = sisr.pre_calculate(y, jnp.asarray(k), sf)
        fr = fbfy + jnp.fft.fft2(tau * z, axes=(-2, -1))
        got = np.asarray(sisr.invls(fb, fbc, f2b, fr, tau, sf))
        want = np.asarray(sisr.data_solution(z, fb, fbc, f2b, fbfy, tau, sf))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


class TestWrapFiltering:
    def test_wrap_convolve_matches_scipy(self, rng):
        from scipy import ndimage

        x = rng.random((12, 10))
        k = rng.random((5, 3))
        got = np.asarray(sisr.wrap_convolve(jnp.asarray(x), jnp.asarray(k)))
        want = ndimage.convolve(x, k, mode="wrap")
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_wrap_correlate_matches_scipy(self, rng):
        from scipy import ndimage

        x = rng.random((8, 8))
        k = rng.random((3, 3))
        got = np.asarray(sisr.wrap_correlate(jnp.asarray(x), jnp.asarray(k)))
        want = ndimage.correlate(x, k, mode="wrap")
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_wrap_correlate_matches_torch_imfilter(self, rng):
        """Reference imfilter = circular pad + conv2d (utils_sisr.py:489)."""
        import torch
        import torch.nn.functional as F

        x = rng.random((10, 10))
        k = rng.random((5, 5))
        pad = (k.shape[0] - 1) // 2
        xt = torch.from_numpy(x)[None, None]
        xt = torch.cat([xt, xt[:, :, 0:pad, :]], dim=2)
        xt = torch.cat([xt, xt[:, :, :, 0:pad]], dim=3)
        xt = torch.cat([xt[:, :, -2 * pad:-pad, :], xt], dim=2)
        xt = torch.cat([xt[:, :, :, -2 * pad:-pad], xt], dim=3)
        want = F.conv2d(xt, torch.from_numpy(k)[None, None]).numpy()[0, 0]
        got = np.asarray(sisr.wrap_correlate(jnp.asarray(x), jnp.asarray(k)))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_g_gt_adjoint_for_symmetric_kernel(self, rng):
        """G/Gt are exact adjoints when the kernel is symmetric (the
        reference pair has the same caveat)."""
        k = rng.random((5, 5))
        k = k + k[::-1, ::-1]  # centro-symmetric
        k /= k.sum()
        x = jnp.asarray(rng.random((12, 12)))
        y = jnp.asarray(rng.random((4, 4)))
        lhs = float(jnp.sum(sisr.G(x, jnp.asarray(k), 3) * y))
        rhs = float(jnp.sum(x * sisr.Gt(y, jnp.asarray(k), 3)))
        assert abs(lhs - rhs) < 1e-10

    def test_interpolation_down(self, rng):
        x = jnp.asarray(rng.random((8, 8)))
        lr, y, mask = sisr.interpolation_down(x, 2)
        np.testing.assert_allclose(np.asarray(lr), np.asarray(x)[::2, ::2])
        np.testing.assert_allclose(np.asarray(y)[::2, ::2], np.asarray(lr))
        assert float(jnp.sum(mask)) == 16.0
        lr_c, _, mask_c = sisr.interpolation_down(x, 4, center=True)
        np.testing.assert_allclose(np.asarray(lr_c),
                                   np.asarray(x)[1::4, 1::4])
        assert float(mask_c[1, 1]) == 1.0 and float(mask_c[0, 0]) == 0.0


class TestDegradations:
    def test_classical_matches_oracle(self, rng):
        from scipy import ndimage

        x = rng.random((12, 12))
        k = rng.random((5, 5))
        k /= k.sum()
        got = np.asarray(sisr.classical_degradation(jnp.asarray(x),
                                                    jnp.asarray(k), 3))
        want = ndimage.convolve(x, k, mode="wrap")[::3, ::3]
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_srmd_dpsr_consistency(self, rng):
        """srmd = blur->bicubic; dpsr = bicubic->blur; with a delta kernel
        both reduce to plain bicubic."""
        from pnp_admm_cnc_mri_tpu.ops import resize

        x = jnp.asarray(rng.random((16, 16)))
        delta = np.zeros((5, 5))
        delta[2, 2] = 1.0
        want = np.asarray(resize.imresize(x, 0.5))
        np.testing.assert_allclose(
            np.asarray(sisr.srmd_degradation(x, jnp.asarray(delta), 2)),
            want, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(sisr.dpsr_degradation(x, jnp.asarray(delta), 2)),
            want, rtol=1e-8, atol=1e-10)

    def test_bicubic_degradation_batched(self, rng):
        x = jnp.asarray(rng.random((3, 16, 16)))
        out = sisr.bicubic_degradation(x, 2)
        assert out.shape == (3, 8, 8)
        one = sisr.bicubic_degradation(x[1], 2)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(one),
                                   rtol=1e-12)


class TestKernels:
    def test_gm_blur_kernel_matches_scipy_pdf(self):
        import scipy.stats as ss

        cov = np.array([[4.0, 1.2], [1.2, 2.0]])
        size = 9
        got = sisr.gm_blur_kernel([0.0, 0.0], cov, size=size)
        center = size / 2.0 + 0.5
        want = np.zeros((size, size))
        for y in range(size):
            for x in range(size):
                cy = y - center + 1
                cx = x - center + 1
                want[y, x] = ss.multivariate_normal.pdf(
                    [cx, cy], mean=[0.0, 0.0], cov=cov)
        want /= want.sum()
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_anisotropic_gaussian_properties(self):
        k_iso = sisr.anisotropic_gaussian(15, theta=0.3, l1=4.0, l2=4.0)
        assert abs(k_iso.sum() - 1.0) < 1e-12
        # isotropic case is rotation-invariant
        k_iso2 = sisr.anisotropic_gaussian(15, theta=1.1, l1=4.0, l2=4.0)
        np.testing.assert_allclose(k_iso, k_iso2, atol=1e-12)
        # theta=0: major axis along x -> wider along columns than rows
        k_an = sisr.anisotropic_gaussian(15, theta=0.0, l1=9.0, l2=1.0)
        row_spread = (k_an.sum(axis=1) > 1e-3).sum()
        col_spread = (k_an.sum(axis=0) > 1e-3).sum()
        assert col_spread > row_spread

    def test_gen_kernel_normalized_and_deterministic(self):
        rng = np.random.default_rng(0)
        k1 = sisr.gen_kernel(rng=np.random.default_rng(7))
        k2 = sisr.gen_kernel(rng=np.random.default_rng(7))
        np.testing.assert_allclose(k1, k2)
        assert abs(k1.sum() - 1.0) < 1e-12
        assert k1.shape == (15, 15)
        k3 = sisr.gen_kernel(k_size=np.array([11, 11]),
                             scale_factor=np.array([2, 2]), rng=rng)
        assert k3.shape == (11, 11)

    def test_pca_matrix_shape_and_orthonormal(self):
        p = sisr.cal_pca_matrix(ksize=7, dim_pca=5, num_samples=60,
                                rng=np.random.default_rng(3))
        assert p.shape == (5, 49)
        np.testing.assert_allclose(p @ p.T, np.eye(5), atol=1e-10)

    def test_pca_reconstructs_sampled_kernels(self):
        """Kernels from the sampling family project back with low error."""
        rng = np.random.default_rng(11)
        p = sisr.cal_pca_matrix(ksize=9, dim_pca=15, num_samples=300, rng=rng)
        k = sisr.anisotropic_gaussian(9, theta=0.8, l1=5.0, l2=2.0)
        v = k.flatten(order="F")
        recon = p.T @ (p @ v)
        assert np.linalg.norm(recon - v) / np.linalg.norm(v) < 0.05


class TestShiftTools:
    def test_shift_pixel_moves_ramp(self):
        h = 16
        ramp = np.tile(np.arange(h, dtype=np.float64), (h, 1))
        out = sisr.shift_pixel(ramp, sf=3)  # shift (sf-1)/2 = 1.0
        np.testing.assert_allclose(out[:, :-1], ramp[:, 1:], atol=1e-12)
        out_c = sisr.shift_pixel(np.stack([ramp] * 2, -1), sf=3)
        np.testing.assert_allclose(out_c[..., 0], out, atol=1e-12)

    def test_shift_pixel_identity_sf1(self, rng):
        x = rng.random((8, 8))
        np.testing.assert_allclose(sisr.shift_pixel(x, 1), x, atol=1e-12)

    def test_comp_upto_shift_recovers_known_shift(self, rng):
        """A 2-pixel-translated image must score ~perfectly and report the
        shift."""
        base = np.zeros((64, 64))
        yy, xx = np.mgrid[0:64, 0:64]
        base = (128 + 60 * np.sin(xx / 3.0) * np.cos(yy / 5.0)
                + 30 * np.sin((xx + yy) / 7.0))
        shifted = np.roll(base, (2, -1), axis=(0, 1))
        p, s, (sy, sx) = sisr.comp_upto_shift(shifted, base, maxshift=3,
                                              border=10, min_interval=0.5)
        assert p > 45.0
        assert s > 0.99
        assert abs(sy - 2.0) < 0.51 and abs(sx + 1.0) < 0.51
