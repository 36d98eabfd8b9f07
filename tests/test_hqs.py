"""HQS solver family (solvers/hqs.py) — the DPIR iteration on the MRI
masked-FFT problem.

No reference counterpart for MRI (the reference vendors the DPIR sigma
ladder, ``utils/utils_pnp.py:14-23``, but never the HQS iteration it
drives); the framework's own SR/deblur pipelines are the HQS siblings.
Pins: the k-space data solve's closed form at both alpha extremes,
exact one-step recovery under a full mask, batching, ladder coupling
(the prox sees every iteration index), and the CLI pipeline end-to-end.
"""

import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.ops import schedules
from pnp_admm_cnc_mri_tpu.solvers import hqs

from tests.conftest import requires_reference_data


def _scenario(rng, n=32, b=1):
    img = rng.random((b, n, n))
    mask = (rng.random((n, n)) < 0.35).astype(np.float64)
    noise = 0.5 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    y = np.fft.fft2(img, axes=(-2, -1)) * mask + noise
    return img, mask, y


class TestHQSCore:
    def test_full_mask_identity_denoiser_recovers_exactly(self, rng):
        """Full sampling + noiseless y + identity denoiser: the alpha->0
        data solve replaces every frequency with y, so one iteration
        returns the image exactly (up to the magnitude projection, a
        no-op for non-negative images)."""
        img = rng.random((16, 16))
        mask = np.ones((16, 16))
        y = np.fft.fft2(img)
        z, _ = hqs.run_hqs(
            jnp.asarray(y, jnp.complex128), jnp.asarray(mask),
            iter_num=1, denoise=lambda u, i: u,
            alphas=np.array([1e-12]), clamp=False, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(z), img, atol=1e-9)

    def test_large_alpha_freezes_iterate(self, rng):
        """alpha -> inf makes the data solve a no-op (x = z), so with an
        identity denoiser the iterate stays at the zero-filled init."""
        img, mask, y = _scenario(rng, n=16)
        yj = jnp.asarray(y[0], jnp.complex128)
        x0 = np.abs(np.fft.ifft2(y[0]))
        z, _ = hqs.run_hqs(
            yj, jnp.asarray(mask), iter_num=3,
            denoise=lambda u, i: u, alphas=np.full(3, 1e12),
            clamp=False, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(z), x0, atol=1e-8)

    def test_data_solve_closed_form(self, rng):
        """One HQS x-step matches the hand-computed k-space blend
        xf[m] = (y + alpha*zf)/(1 + alpha), xf[~m] = zf."""
        img, mask, y = _scenario(rng, n=16)
        alpha = 0.37
        z0 = np.abs(np.fft.ifft2(y[0]))  # the solver's init
        zf = np.fft.fft2(z0)
        xf = np.where(mask != 0, (y[0] + alpha * zf) / (1.0 + alpha), zf)
        x_expected = np.abs(np.real(np.fft.ifft2(xf)))
        got, _ = hqs.run_hqs(
            jnp.asarray(y[0], jnp.complex128), jnp.asarray(mask),
            iter_num=1, denoise=lambda u, i: u,
            alphas=np.array([alpha]), clamp=False, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got), x_expected, atol=1e-10)

    def test_batched_leading_dims(self, rng):
        """(B, H, W) batch solves equal per-item solves."""
        img, mask, y = _scenario(rng, b=3)
        rhos, _ = schedules.get_rho_sigma(iter_num=8)
        yj, mj = jnp.asarray(y, jnp.complex128), jnp.asarray(mask)
        soft = lambda u, i: jnp.sign(u) * jnp.maximum(jnp.abs(u) - 0.01, 0.0)
        zb, _ = hqs.run_hqs(yj, mj, 8, soft, rhos, dtype=jnp.float64)
        for i in range(3):
            zi, _ = hqs.run_hqs(yj[i], mj, 8, soft, rhos, dtype=jnp.float64)
            np.testing.assert_allclose(np.asarray(zb[i]), np.asarray(zi),
                                       atol=1e-12)

    def test_ladder_indices_and_clamp(self, rng):
        """pnp_hqs walks the full ladder (the prox sees indices 0..n-1 as
        a traced scan counter) and clamps iterates to [0,1]."""
        img, mask, y = _scenario(rng, b=2)
        seen = []

        def denoise(u, i):
            seen.append(i)
            return u * 1.5 - 0.1  # pushes outside [0,1] to exercise clamp

        z, _ = hqs.pnp_hqs(
            jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32),
            6, denoise, sigma255=10.0, model_sigma2=15.0)
        x = np.asarray(z)
        assert x.shape == (2, 32, 32)
        assert (x >= 0).all() and (x <= 1).all() and np.isfinite(x).all()
        assert len(seen) == 1  # traced once inside the scan

    def test_residual_collection(self, rng):
        """collect_residuals returns per-iteration ||x - z|| per item."""
        img, mask, y = _scenario(rng, b=2)
        rhos, _ = schedules.get_rho_sigma(iter_num=5)
        z, res = hqs.run_hqs(
            jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32),
            5, lambda u, i: jnp.clip(u, 0.2, 0.8), rhos,
            collect_residuals=True)
        assert res.shape == (5, 2)
        assert np.isfinite(np.asarray(res)).all()


class TestBM3DLadderTracedIndex:
    def test_traced_index_matches_static(self, rng):
        """The BM3D ladder prior gathers sigma on device when the
        iteration index is traced (the scanned HQS path) — identical to
        the concrete-index path the Python-loop pipelines use."""
        import jax

        from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

        img = jnp.asarray(rng.random((32, 32)), jnp.float32)
        den = bm3d_prior.make_bm3d_ladder_denoiser(
            np.array([0.15, 0.05], np.float64))
        static = den(img, 1)
        traced = jax.jit(lambda v, i: den(v, i))(img, jnp.asarray(1))
        np.testing.assert_allclose(np.asarray(traced), np.asarray(static),
                                   atol=1e-6)


@requires_reference_data
class TestHQSGolden:
    def test_pnp_hqs_dncnn_quality_band(self):
        """PnP-HQS with the clean dncnn_25 weights on the golden scenario
        (set1, Q_Random30) lands in the tuned band — well above the
        zero-fill init (~21 dB) and the classical golden (23.87)."""
        from pnp_admm_cnc_mri_tpu import config as cfg_mod
        from pnp_admm_cnc_mri_tpu.cli import experiments
        from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

        tuned = cfg_mod.TUNED_HQS_D["dncnn_25"]
        denoise = denoiser_mod.build_denoiser(
            "dncnn_25",
            weights=denoiser_mod.resolve_weights("dncnn_25", clean=True),
            iter_num=tuned["iter_num"])
        out = experiments.run_pnp_hqs(
            denoise, tuned["iter_num"], sigma255=tuned["sigma255"],
            testset="set1", mask_name="Q_Random30",
            results_dir="/tmp/pnpadmm_test_results", save_images=False,
        )
        assert out["psnr"] > 28.0
