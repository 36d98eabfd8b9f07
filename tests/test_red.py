"""RED solver family (solvers/red.py) — regularization by denoising.

No reference counterpart (gradient-form PnP with an explicit
denoiser-built regularizer; Romano-Elad-Milanfar 2017). Pins: both
variants' update formulas against hand-rolled NumPy iterates, the
fixed-point variant's large-lam limit, batching, and a golden-scenario
quality band with the clean weights.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.solvers import red

from tests.conftest import requires_reference_data


def _scenario(rng, n=32, b=1):
    img = rng.random((b, n, n))
    mask = (rng.random((n, n)) < 0.35).astype(np.float64)
    noise = 0.5 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    y = np.fft.fft2(img, axes=(-2, -1)) * mask + noise
    return img, mask, y


def _np_grad(x, y, mask):
    res = np.fft.fft2(x) * mask
    res = np.where(mask != 0, res - y, res)
    return np.real(np.fft.ifft2(res))


class TestREDCore:
    @pytest.mark.parametrize("variant", ["gd", "fp"])
    def test_update_formula_vs_numpy(self, rng, variant):
        """3 RED iterations with a linear 'denoiser' match the hand-rolled
        NumPy recursion for both variants (clamp off, f64)."""
        img, mask, y = _scenario(rng, n=16)
        lam, step = 0.4, 0.8
        D = lambda u: 0.9 * u + 0.05

        x = np.abs(np.fft.ifft2(y[0]))
        for _ in range(3):
            g = _np_grad(x, y[0], mask)
            if variant == "gd":
                x = x - step * (g + lam * (x - D(x)))
            else:
                x = (x - step * g + step * lam * D(x)) / (1.0 + step * lam)
        got, _ = red.run_red(
            jnp.asarray(y[0], jnp.complex128), jnp.asarray(mask), 3,
            lambda u, i: 0.9 * u + 0.05, lam=lam, step=step,
            variant=variant, clamp=False, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got), x, atol=1e-10)

    def test_fp_large_lam_pins_to_denoised(self, rng):
        """lam -> inf makes the fixed-point update converge to D(x): with a
        constant denoiser the iterate lands on that constant."""
        img, mask, y = _scenario(rng, n=16)
        got, _ = red.run_red(
            jnp.asarray(y[0], jnp.complex128), jnp.asarray(mask), 4,
            lambda u, i: jnp.full_like(u, 0.37), lam=1e9, step=1.0,
            variant="fp", clamp=False, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got), 0.37, atol=1e-6)

    def test_identity_denoiser_gd_is_plain_gradient_descent(self, rng):
        """D = identity kills the regularizer gradient: RED-GD equals plain
        gradient descent on the data term for any lam."""
        img, mask, y = _scenario(rng, n=16)
        x = np.abs(np.fft.ifft2(y[0]))
        for _ in range(5):
            x = x - 1.0 * _np_grad(x, y[0], mask)
        got, _ = red.run_red(
            jnp.asarray(y[0], jnp.complex128), jnp.asarray(mask), 5,
            lambda u, i: u, lam=7.3, step=1.0, variant="gd",
            clamp=False, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got), x, atol=1e-10)

    def test_batched_and_residuals(self, rng):
        """(B,H,W) batch equals per-item solves; the residual trace is the
        per-iteration ||x - D(x)|| per element."""
        img, mask, y = _scenario(rng, b=3)
        yj, mj = jnp.asarray(y, jnp.complex128), jnp.asarray(mask)
        D = lambda u, i: jnp.clip(u, 0.1, 0.9)
        xb, res = red.run_red(yj, mj, 6, D, lam=0.3, dtype=jnp.float64,
                              collect_residuals=True)
        assert res.shape == (6, 3) and np.isfinite(np.asarray(res)).all()
        for i in range(3):
            xi, _ = red.run_red(yj[i], mj, 6, D, lam=0.3, dtype=jnp.float64)
            np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi),
                                       atol=1e-12)

    def test_unknown_variant_raises(self, rng):
        img, mask, y = _scenario(rng, n=8)
        with pytest.raises(ValueError, match="variant"):
            red.run_red(jnp.asarray(y[0], jnp.complex64),
                        jnp.asarray(mask, jnp.float32), 2,
                        lambda u, i: u, variant="nope")


@requires_reference_data
class TestREDGolden:
    def test_red_dncnn_quality_band(self):
        """RED-FP with the clean dncnn_25 weights on the golden scenario
        beats the classical golden (23.87) by a wide margin."""
        from pnp_admm_cnc_mri_tpu import config as cfg_mod
        from pnp_admm_cnc_mri_tpu.cli import experiments
        from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

        tuned = cfg_mod.TUNED_RED_D["dncnn_25"]
        denoise = denoiser_mod.build_denoiser(
            "dncnn_25",
            weights=denoiser_mod.resolve_weights("dncnn_25", clean=True),
            iter_num=tuned["iter_num"])
        out = experiments.run_red(
            denoise, tuned["iter_num"], lam=tuned["lam"],
            testset="set1", mask_name="Q_Random30",
            results_dir="/tmp/pnpadmm_test_results", save_images=False,
        )
        assert out["psnr"] > 27.5
