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

    def test_upsample_downsample_adjoint(self, rng):
        """S and S^T must be adjoint: <Sx, y> == <x, S^T y>."""
        x = jnp.asarray(rng.random((8, 8)))
        y = jnp.asarray(rng.random((4, 4)))
        lhs = float(jnp.sum(sisr.downsample(x, 2) * y))
        rhs = float(jnp.sum(x * sisr.upsample_zeros(y, 2)))
        assert abs(lhs - rhs) < 1e-12
