"""Consensus ADMM: sharded == batched; multi-mask fusion beats single-mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.parallel import consensus, mesh as mesh_lib
from pnp_admm_cnc_mri_tpu.solvers import admm


def _multi_mask_scenario(rng, n_obs=4, n=32):
    img = rng.random((n, n))
    masks = np.stack(
        [(rng.random((n, n)) < 0.25).astype(np.float64) for _ in range(n_obs)]
    )
    noises = 0.3 * (
        rng.normal(size=(n_obs, n, n)) + 1j * rng.normal(size=(n_obs, n, n))
    )
    ys = np.fft.fft2(img[None], axes=(-2, -1)) * masks + noises
    return img, masks, ys


class TestConsensus:
    def test_sharded_matches_batched(self, rng):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        img, masks, ys = _multi_mask_scenario(rng, n_obs=8)
        cfg = ADMMConfig(iter_num=15, lam=0.1, rho=0.05)

        z_batched, _ = consensus.run_consensus(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32), cfg
        )
        mesh = mesh_lib.make_mesh(n_data=4, devices=jax.devices()[:4])
        z_sharded = consensus.run_consensus_sharded(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32), cfg, mesh
        )
        np.testing.assert_allclose(
            np.asarray(z_sharded), np.asarray(z_batched), rtol=2e-5, atol=1e-6
        )

    def test_fusion_beats_single_mask(self, rng):
        """Joint reconstruction from 4 x 25% masks must beat the average
        single-mask reconstruction (more k-space coverage through
        consensus; individual masks vary in luck over low frequencies)."""
        img, masks, ys = _multi_mask_scenario(rng, n_obs=4)
        cfg = ADMMConfig(iter_num=40, lam=0.1, rho=0.05)

        z, _ = consensus.run_consensus(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32), cfg
        )
        err_consensus = float(jnp.linalg.norm(z - img) / np.linalg.norm(img))

        errs_single = []
        for i in range(4):
            final, _ = admm.admm_l1(
                jnp.asarray(ys[i], jnp.complex64),
                jnp.asarray(masks[i], jnp.float32),
                cfg,
            )
            errs_single.append(float(jnp.linalg.norm(final.x - img) / np.linalg.norm(img)))
        assert err_consensus < np.mean(errs_single), (err_consensus, errs_single)

    def test_consensus_consistency_identical_obs(self, rng):
        """With identical observations, consensus equals the single solve."""
        img, masks, ys = _multi_mask_scenario(rng, n_obs=1)
        masks4 = np.repeat(masks, 4, axis=0)
        ys4 = np.repeat(ys, 4, axis=0)
        cfg = ADMMConfig(iter_num=20, lam=0.1, rho=0.05)
        z, _ = consensus.run_consensus(
            jnp.asarray(ys4, jnp.complex64), jnp.asarray(masks4, jnp.float32), cfg
        )
        final, _ = admm.admm_l1(
            jnp.asarray(ys[0], jnp.complex64), jnp.asarray(masks[0], jnp.float32), cfg,
            fused=False,
        )
        np.testing.assert_allclose(np.asarray(z), np.asarray(final.z), rtol=1e-5, atol=1e-6)


class TestConsensusDCMethod:
    def test_matmul_dc_matches_fft(self, rng):
        """dc_method='matmul' (the accelerator auto-pick) must match the
        FFT-kernel solve with consensus-layout batched masks. (The
        Nyquist-packed variant is measured-off by default; its batched
        broadcast is pinned in test_ops.TestMatmulDFT.)"""
        img, masks, ys = _multi_mask_scenario(rng, n_obs=4)
        cfg = ADMMConfig(iter_num=12, lam=0.1, rho=0.05)
        z_f, x_f = consensus.run_consensus(
            jnp.asarray(ys), jnp.asarray(masks, jnp.float64), cfg,
            dtype=jnp.float64, dc_method="fft")
        z_m, x_m = consensus.run_consensus(
            jnp.asarray(ys), jnp.asarray(masks, jnp.float64), cfg,
            dtype=jnp.float64, dc_method="matmul")
        np.testing.assert_allclose(np.asarray(z_m), np.asarray(z_f),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_f),
                                   atol=1e-10)


class TestConsensusFISTA:
    def test_sharded_matches_batched(self, rng):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod

        img, masks, ys = _multi_mask_scenario(rng, n_obs=8)
        prox_fn = lambda i, u: prox_mod.soft(u, 5e-3)
        x_b = consensus.run_consensus_fista(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            12, prox_fn)
        mesh = mesh_lib.make_mesh(n_data=4, devices=jax.devices()[:4])
        x_s = consensus.run_consensus_fista_sharded(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            12, prox_fn, mesh)
        np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_b),
                                   rtol=2e-5, atol=1e-6)

    def test_preconditioned_beats_mean_gradient(self, rng):
        """The union-preconditioned gradient (full step on every covered
        frequency) reconstructs better than the plain gradient mean,
        which under-steps frequencies covered by few masks."""
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod

        img, masks, ys = _multi_mask_scenario(rng, n_obs=4)
        prox_fn = lambda i, u: prox_mod.soft(u, 2e-3)
        kw = dict(iter_num=40, prox_fn=prox_fn)
        x_p = consensus.run_consensus_fista(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            precondition=True, **kw)
        x_m = consensus.run_consensus_fista(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            precondition=False, **kw)
        err_p = float(jnp.linalg.norm(x_p - img) / np.linalg.norm(img))
        err_m = float(jnp.linalg.norm(x_m - img) / np.linalg.norm(img))
        assert err_p < err_m

    def test_fusion_beats_single_mask_fista(self, rng):
        """4 x 25% masks fused must beat the average single-mask FISTA."""
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod
        from pnp_admm_cnc_mri_tpu.solvers import fista

        img, masks, ys = _multi_mask_scenario(rng, n_obs=4)
        prox_fn = lambda i, u: prox_mod.soft(u, 2e-3)
        x = consensus.run_consensus_fista(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            40, prox_fn)
        err_c = float(jnp.linalg.norm(x - img) / np.linalg.norm(img))
        errs = []
        for i in range(4):
            st, _ = fista.run_fista(
                jnp.asarray(ys[i], jnp.complex64),
                jnp.asarray(masks[i], jnp.float32), 40, prox_fn)
            errs.append(float(jnp.linalg.norm(st.x - img) / np.linalg.norm(img)))
        assert err_c < np.mean(errs)


class TestConsensusHQS:
    """Multi-mask HQS: exact joint data solve + single setup reduction."""

    def test_sharded_matches_batched(self, rng):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod

        img, masks, ys = _multi_mask_scenario(rng, n_obs=8)
        denoise = lambda u, i: prox_mod.soft(u, 2e-3)
        kw = dict(iter_num=12, denoise=denoise, sigma255=10.0)
        z_b = consensus.run_consensus_hqs(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            **kw)
        mesh = mesh_lib.make_mesh(n_data=4, devices=jax.devices()[:4])
        z_s = consensus.run_consensus_hqs_sharded(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            mesh=mesh, **kw)
        np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_b),
                                   rtol=2e-5, atol=1e-6)

    def test_sharded_alphas_override_matches_batched(self, rng):
        """The sharded variant honors an explicit alphas ladder (the
        checkpoint/resume path) identically to the batched one."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod

        img, masks, ys = _multi_mask_scenario(rng, n_obs=8)
        denoise = lambda u, i: prox_mod.soft(u, 2e-3)
        alphas = np.linspace(0.9, 0.1, 7)
        z_b = consensus.run_consensus_hqs(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            iter_num=7, denoise=denoise, alphas=alphas)
        mesh = mesh_lib.make_mesh(n_data=4, devices=jax.devices()[:4])
        z_s = consensus.run_consensus_hqs_sharded(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            iter_num=7, denoise=denoise, mesh=mesh, alphas=alphas)
        np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_b),
                                   rtol=2e-5, atol=1e-6)

    def test_single_obs_reduces_to_hqs(self, rng):
        """N=1 must be EXACTLY the single-mask ladder solve of
        solvers.hqs.pnp_hqs (same reference convention La2 = alpha,
        【1】ADMM_L1.py:115-120)."""
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod
        from pnp_admm_cnc_mri_tpu.solvers import hqs

        img, masks, ys = _multi_mask_scenario(rng, n_obs=1)
        denoise = lambda u, i: prox_mod.soft(u, 2e-3)
        kw = dict(iter_num=10, denoise=denoise, sigma255=12.0,
                  model_sigma1=40.0, model_sigma2=10.0)
        z_c = consensus.run_consensus_hqs(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            **kw)
        # consensus reads observations only at sampled frequencies (its
        # init is |ifft2(S/c)|), so the single-mask equivalent runs on
        # the masked observation
        z_h, _ = hqs.pnp_hqs(
            jnp.asarray(ys[0] * masks[0], jnp.complex64),
            jnp.asarray(masks[0], jnp.float32), **kw)
        np.testing.assert_allclose(np.asarray(z_c), np.asarray(z_h),
                                   rtol=1e-5, atol=1e-6)

    def test_identical_masks_equal_averaged_single(self, rng):
        """N copies of the SAME mask with different noises must equal the
        single-mask run on the averaged observation with the alpha ladder
        scaled by 1/N — the closed-form (S + a Zf)/(N + a) identity."""
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod, schedules
        from pnp_admm_cnc_mri_tpu.solvers import hqs

        n_obs, it = 3, 8
        img, _, _ = _multi_mask_scenario(rng)
        n = img.shape[0]
        mask = (rng.random((n, n)) < 0.3).astype(np.float64)
        noises = 0.2 * (rng.normal(size=(n_obs, n, n))
                        + 1j * rng.normal(size=(n_obs, n, n)))
        ys = np.fft.fft2(img[None], axes=(-2, -1)) * mask[None] + noises
        denoise = lambda u, i: prox_mod.soft(u, 2e-3)

        z_c = consensus.run_consensus_hqs(
            jnp.asarray(ys, jnp.complex64),
            jnp.asarray(np.broadcast_to(mask, ys.shape), jnp.float32),
            it, denoise, sigma255=10.0)
        alphas, _ = schedules.get_rho_sigma(
            sigma=10.0 / 255.0, iter_num=it,
            model_sigma1=49.0, model_sigma2=15.0)  # run_consensus_hqs defaults
        y_bar = jnp.asarray(ys.mean(axis=0) * mask, jnp.complex64)
        z_h, _ = hqs.run_hqs(
            y_bar, jnp.asarray(mask, jnp.float32), it, denoise,
            np.asarray(alphas) / n_obs)
        np.testing.assert_allclose(np.asarray(z_c), np.asarray(z_h),
                                   rtol=1e-4, atol=1e-5)

    def test_joint_solve_is_exact(self, rng):
        """The per-frequency closed form must zero the gradient of the
        joint HQS x-objective (independent optimality check via
        jax.grad, not a formula replication)."""
        img, masks, ys = _multi_mask_scenario(rng, n_obs=4)
        ys_j = jnp.asarray(ys, jnp.complex64)
        m = jnp.asarray((masks != 0), jnp.float32)
        z = jnp.asarray(rng.random(img.shape), jnp.float32)
        alpha = 0.37
        nn = img.size

        cnt = jnp.sum(m, axis=0)
        S = jnp.sum(jnp.where(m != 0, ys_j, 0.0), axis=0)
        zf = jnp.fft.fft2(z)
        xf = (S + alpha * zf) / (cnt + alpha)

        def objective(xf_ri):
            x_c = xf_ri[0] + 1j * xf_ri[1]
            data = sum(
                jnp.sum(jnp.abs(m[i] * x_c - jnp.where(m[i] != 0, ys_j[i], 0.0)) ** 2)
                for i in range(m.shape[0]))
            return (data + alpha * jnp.sum(jnp.abs(x_c - zf) ** 2)) / nn

        g = jax.grad(objective)(jnp.stack([jnp.real(xf), jnp.imag(xf)]))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-4)

    def test_fusion_beats_single_mask_hqs(self, rng):
        """4 x 25% masks fused must beat the average single-mask HQS."""
        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod
        from pnp_admm_cnc_mri_tpu.solvers import hqs

        img, masks, ys = _multi_mask_scenario(rng, n_obs=4)
        denoise = lambda u, i: prox_mod.soft(u, 2e-3)
        kw = dict(iter_num=30, denoise=denoise, sigma255=10.0)
        z = consensus.run_consensus_hqs(
            jnp.asarray(ys, jnp.complex64), jnp.asarray(masks, jnp.float32),
            **kw)
        err_c = float(jnp.linalg.norm(z - img) / np.linalg.norm(img))
        errs = []
        for i in range(4):
            zi, _ = hqs.pnp_hqs(
                jnp.asarray(ys[i], jnp.complex64),
                jnp.asarray(masks[i], jnp.float32), **kw)
            errs.append(float(jnp.linalg.norm(zi - img) / np.linalg.norm(img)))
        assert err_c < np.mean(errs)


class TestBatchedConsensus:
    """Round-4 axis convention: observation axis is -3; leading axes are
    independent consensus problems. Batched == per-image for all three
    families (this is what lets the testset solve as ONE program and the
    bench fill the chip — VERDICT r3 #3)."""

    def _problems(self, rng, b=3, n=3, size=32):
        imgs = rng.random((b, size, size))
        masks = (rng.random((n, size, size)) < 0.4).astype(np.float64)
        noise = 0.1 * (rng.normal(size=(size, size))
                       + 1j * rng.normal(size=(size, size)))
        ys = np.fft.fft2(imgs, axes=(-2, -1))[:, None] * masks + noise
        return jnp.asarray(ys), jnp.asarray(masks)

    def test_consensus_admm_batched_equals_per_image(self, rng):
        from pnp_admm_cnc_mri_tpu.config import ADMMConfig

        ys, masks = self._problems(rng)
        cfg = ADMMConfig(iter_num=5, lam=0.1, rho=0.05)
        zb, xb = consensus.run_consensus(ys, masks, cfg, dc_method="fft")
        assert zb.shape == (3, 32, 32) and xb.shape == (3, 3, 32, 32)
        for i in range(3):
            zi, _ = consensus.run_consensus(ys[i], masks, cfg,
                                            dc_method="fft")
            np.testing.assert_allclose(np.asarray(zb[i]), np.asarray(zi),
                                       atol=1e-6)

    def test_consensus_fista_batched_equals_per_image(self, rng):
        from pnp_admm_cnc_mri_tpu.ops import prox

        ys, masks = self._problems(rng)
        prox_fn = lambda i, u: prox.soft(u, 5e-3)
        zb = consensus.run_consensus_fista(ys, masks, 5, prox_fn)
        assert zb.shape == (3, 32, 32)
        for i in range(3):
            zi = consensus.run_consensus_fista(ys[i], masks, 5, prox_fn)
            np.testing.assert_allclose(np.asarray(zb[i]), np.asarray(zi),
                                       atol=1e-6)

    def test_consensus_hqs_batched_equals_per_image(self, rng):
        ys, masks = self._problems(rng)
        den = lambda u, i: u * 0.97
        zb = consensus.run_consensus_hqs(ys, masks, 5, den)
        assert zb.shape == (3, 32, 32)
        for i in range(3):
            zi = consensus.run_consensus_hqs(ys[i], masks, 5, den)
            np.testing.assert_allclose(np.asarray(zb[i]), np.asarray(zi),
                                       atol=1e-6)
