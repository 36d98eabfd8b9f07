"""Solver parity vs NumPy oracles, batching equivalence, tolerance stopping."""

import jax
import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.ops import fourier
from pnp_admm_cnc_mri_tpu.solvers import admm
from tests import oracle


def _scenario(rng, n=32):
    img = rng.random((n, n))
    mask = (rng.random((n, n)) < 0.3).astype(np.float64)
    mask[0, 0] = 1.0  # keep DC sampled
    noise = 0.5 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    y = np.fft.fft2(img) * mask + noise
    return img, mask, noise, y


class TestADMML1:
    def test_matches_numpy_oracle(self, rng):
        img, mask, noise, y = _scenario(rng)
        cfg = ADMMConfig(iter_num=30, lam=0.1, rho=0.015)
        final, _ = admm.admm_l1(
            jnp.asarray(y), jnp.asarray(mask), cfg, dtype=jnp.float64
        )
        expected = oracle.admm_l1_numpy(img, mask, noise, 30, 0.1, 0.015)
        np.testing.assert_allclose(np.asarray(final.x), expected, rtol=1e-9, atol=1e-11)

    def test_jit_sweep_variant(self, rng):
        img, mask, noise, y = _scenario(rng)
        x = admm.admm_l1_jit(jnp.asarray(y), jnp.asarray(mask), 10, 0.015, 0.1)
        expected = oracle.admm_l1_numpy(img, mask, noise, 10, 0.1, 0.015)
        np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-9, atol=1e-11)

    def test_vmap_over_params_matches_loop(self, rng):
        """A (rho, lam) sweep via vmap equals per-config runs."""
        _, mask, _, y = _scenario(rng)
        rhos = jnp.asarray([0.01, 0.015, 0.05])
        lams = jnp.asarray([0.1, 0.1, 0.2])
        sweep = jax.vmap(lambda r, l: admm.admm_l1_jit(jnp.asarray(y), jnp.asarray(mask), 10, r, l))(
            rhos, lams
        )
        for i in range(3):
            single = admm.admm_l1_jit(
                jnp.asarray(y), jnp.asarray(mask), 10, rhos[i], lams[i]
            )
            np.testing.assert_allclose(np.asarray(sweep[i]), np.asarray(single), rtol=1e-12)


class TestADMMCNC:
    def test_matches_numpy_oracle(self, rng):
        img, mask, noise, y = _scenario(rng)
        cfg = ADMMConfig(iter_num=30, alpha=0.45, lam=0.5, rho=0.05, b=64.0)
        final, _ = admm.admm_cnc(jnp.asarray(y), jnp.asarray(mask), cfg, dtype=jnp.float64)
        expected = oracle.admm_cnc_numpy(img, mask, noise, 30, 0.45, 0.5, 0.05, 64.0)
        np.testing.assert_allclose(np.asarray(final.x), expected, rtol=1e-9, atol=1e-11)

    def test_tolerance_stopping(self, rng):
        _, mask, _, y = _scenario(rng)
        cfg = ADMMConfig(iter_num=200, alpha=0.45, lam=0.5, rho=0.05, b=64.0, tol=1e-3)
        (state, iters) = admm.admm_cnc(jnp.asarray(y), jnp.asarray(mask), cfg, dtype=jnp.float64)
        assert 0 < int(iters) <= 200
        # converged: relative primal residual below tol
        rel = float(
            jnp.linalg.norm(state.x - state.z) / (jnp.linalg.norm(state.x) + 1e-12)
        )
        assert rel <= 1e-3 or int(iters) == 200


class TestPnP:
    def test_identity_denoiser_with_clamp_matches_oracle(self, rng):
        """With D = clip(identity), the solver must follow the clamped
        reference skeleton exactly (clamping quirk incl. the dual)."""
        img, mask, noise, y = _scenario(rng)
        cfg = ADMMConfig(iter_num=20, rho=0.25)

        final, _ = admm.pnp_admm_l1(
            jnp.asarray(y), jnp.asarray(mask), cfg,
            denoise=lambda v, i: jnp.clip(v * 0.9, 0.0, 1.0),
            clamp=True, dtype=jnp.float64,
        )
        expected = oracle.pnp_admm_l1_numpy(
            img, mask, noise, 20, 0.25, lambda v, i: (v * 0.9).clip(0, 1)
        )
        np.testing.assert_allclose(np.asarray(final.x), expected, rtol=1e-9, atol=1e-11)

    def test_cnc_two_slot_denoisers(self, rng):
        """CNC-D with two different pointwise 'denoisers' matches a direct
        NumPy transcription of 【6】:300-302."""
        img, mask, noise, y = _scenario(rng)
        a, rho, lam, b = 1.2, 0.45, 4.0, 0.3
        d1 = lambda v, i: jnp.tanh(v)
        d2 = lambda v, i: v / (1.0 + jnp.abs(v))

        cfg = ADMMConfig(iter_num=15, alpha=a, rho=rho, lam=lam, b=b)
        final, _ = admm.pnp_admm_cnc(
            jnp.asarray(y), jnp.asarray(mask), cfg, d1, d2, clamp=True, dtype=jnp.float64
        )

        # NumPy transcription
        index = np.nonzero(mask)
        la2 = 1.0 / 2.0 / rho
        x = np.abs(np.fft.ifft2(y))
        z = x.copy()
        w = np.zeros_like(x)
        for i in range(15):
            xf = np.fft.fft2(z - w)
            xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
            x = np.abs(np.real(np.fft.ifft2(xf)))
            s = np.tanh(z)
            t = (1 - a) * z + a * (x + w) + a * rho * lam * b * (z - s)
            z = t / (1.0 + np.abs(t))
            w = w + x - z
            x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)
        np.testing.assert_allclose(np.asarray(final.x), x, rtol=1e-9, atol=1e-11)

    def test_residuals_shape(self, rng):
        _, mask, _, y = _scenario(rng)
        ys = jnp.stack([jnp.asarray(y)] * 4)
        cfg = ADMMConfig(iter_num=5, rho=0.015, lam=0.1)
        final, res = admm.admm_l1(
            ys, jnp.asarray(mask), cfg, dtype=jnp.float64, collect_residuals=True
        )
        assert res.shape == (5, 4)
        assert final.x.shape == (4, 32, 32)


class TestAdaptiveRho:
    def test_gamma_one_reduces_to_fixed_rho(self, rng):
        """With gamma=1 the continuation is inert: identical to run_admm
        at the same rho (use_rfft=False path, same dc math)."""
        img, mask, noise, y = _scenario(rng)
        cfg = ADMMConfig(iter_num=20, lam=0.1, rho=0.015)
        ad, _ = admm.admm_l1_adaptive(
            jnp.asarray(y), jnp.asarray(mask), cfg, gamma=1.0,
            dtype=jnp.float64)
        fx, _ = admm.admm_l1(jnp.asarray(y), jnp.asarray(mask), cfg,
                             dtype=jnp.float64, fused=False, use_rfft=False)
        np.testing.assert_allclose(np.asarray(ad.x), np.asarray(fx.x),
                                   rtol=1e-12, atol=1e-14)

    def test_rho_monotone_and_residual_shrinks(self, rng):
        img, mask, noise, y = _scenario(rng)
        cfg = ADMMConfig(iter_num=40, lam=0.1, rho=0.015)
        final, (rhos, deltas) = admm.admm_l1_adaptive(
            jnp.asarray(y), jnp.asarray(mask), cfg, gamma=1.3, eta=0.9,
            dtype=jnp.float64, collect=True)
        rhos = np.asarray(rhos)
        deltas = np.asarray(deltas)
        assert rhos.shape == (40,) and deltas.shape == (40,)
        # continuation only ever decreases rho (reo = 1/beta: beta grows)
        assert np.all(np.diff(rhos) <= 1e-15)
        assert rhos[-1] < rhos[0]  # it actually triggered
        # Chan's guarantee: the combined residual is driven down
        assert deltas[-1] < 0.05 * deltas[0]

    def test_batched_per_element_rho(self, rng):
        """Each batch element adapts its own rho; a batched run matches
        per-image runs exactly."""
        scen = [_scenario(rng) for _ in range(3)]
        y = jnp.asarray(np.stack([s[3] for s in scen]))
        mask = jnp.asarray(scen[0][1])
        cfg = ADMMConfig(iter_num=25, lam=0.1, rho=0.015)
        batched, (rhos, _) = admm.admm_l1_adaptive(
            y, mask, cfg, gamma=1.3, eta=0.9, dtype=jnp.float64, collect=True)
        assert np.asarray(rhos).shape == (25, 3)
        for b in range(3):
            one, _ = admm.admm_l1_adaptive(
                y[b], mask, cfg, gamma=1.3, eta=0.9, dtype=jnp.float64)
            np.testing.assert_allclose(np.asarray(batched.x[b]),
                                       np.asarray(one.x), rtol=1e-12,
                                       atol=1e-14)

    def test_pnp_adaptive_with_identity_denoiser_jits(self, rng):
        img, mask, noise, y = _scenario(rng)
        cfg = ADMMConfig(iter_num=10, rho=0.5)
        fn = jax.jit(lambda y, m: admm.pnp_admm_l1_adaptive(
            y, m, cfg, lambda v, i: v, gamma=1.2)[0].x)
        out = fn(jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32))
        assert out.shape == y.shape
        assert np.isfinite(np.asarray(out)).all()
