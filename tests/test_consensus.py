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
