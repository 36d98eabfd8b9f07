"""Unrolled end-to-end training (train/unroll.py).

The critical contract: the training-time reconstruction must be the SAME
computation the eval CLI runs (``solvers/fista.pnp_fista`` with the
drunet ladder prior built by ``priors/denoiser.build_denoiser``) — else
the trained weights would optimize a different pipeline than the one
they are evaluated in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.models.drunet import UNetRes
from pnp_admm_cnc_mri_tpu.train import unroll


def _scenario(rng, n=64, b=2):
    img = rng.random((b, n, n)).astype(np.float32)
    mask = (rng.random((n, n)) < 0.35).astype(np.float32)
    noise = 2.0 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    y = (np.fft.fft2(img, axes=(-2, -1)) * mask + noise).astype(np.complex64)
    return img, mask, y


class TestUnrolledRecon:
    def _tiny_drunet(self):
        # widths match build_denoiser's (nc, 2nc, 4nc, 8nc) at nc=4
        model = UNetRes(out_nc=1, nc=(4, 8, 16, 32), nb=1)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 2), jnp.float32))
        return model, params

    def test_matches_eval_pipeline(self, rng):
        """make_unrolled_recon == solvers.fista.pnp_fista with the
        build_denoiser drunet prior (same params, same ladder)."""
        from pnp_admm_cnc_mri_tpu.priors import denoiser as dn
        from pnp_admm_cnc_mri_tpu.solvers import fista as fista_mod

        model, params = self._tiny_drunet()
        img, mask, y = _scenario(rng)
        yj, mj = jnp.asarray(y), jnp.asarray(mask)
        it = 4

        den = unroll.make_drunet_ladder_denoise(model, it, nlm255=12.0,
                                                model_sigma1=15.0)
        recon = unroll.make_unrolled_recon(den, it)
        x_train = recon(params, yj, mj)

        eval_den = dn.build_denoiser(
            "drunet_gray", params=params, iter_num=it,
            noise_level_model=12.0 / 255.0, model_sigma1=15.0, x8=False,
            nc=4, nb=1,
        )
        final, _ = fista_mod.pnp_fista(yj, mj, it, eval_den, clamp=True)
        np.testing.assert_allclose(np.asarray(x_train), np.asarray(final.x),
                                   atol=2e-6)

    def test_gradient_flows_and_loss_decreases(self, rng):
        model, params = self._tiny_drunet()
        img, mask, y = _scenario(rng)
        den = unroll.make_drunet_ladder_denoise(model, 3)
        recon = unroll.make_unrolled_recon(den, 3)

        def loss(p):
            xr = recon(p, jnp.asarray(y), jnp.asarray(mask))
            return 0.5 * jnp.mean((xr - jnp.asarray(img)) ** 2)

        g = jax.grad(loss)(params)
        norms = [float(jnp.abs(a).sum()) for a in jax.tree.leaves(g)]
        assert sum(norms) > 0.0
        # remat and no-remat agree (the checkpoint wrapper is semantic-free)
        recon_nr = unroll.make_unrolled_recon(den, 3, remat=False)
        np.testing.assert_allclose(
            np.asarray(recon(params, jnp.asarray(y), jnp.asarray(mask))),
            np.asarray(recon_nr(params, jnp.asarray(y), jnp.asarray(mask))),
            atol=1e-6)

    def test_train_unrolled_smoke(self, rng):
        model, params = self._tiny_drunet()
        masks = (rng.random((2, 64, 64)) < 0.4).astype(np.float32)
        real = rng.random((3, 64, 64)).astype(np.float32)
        den = unroll.make_drunet_ladder_denoise(model, 2)
        p, losses = unroll.train_unrolled(
            model, den, masks, iter_num=2, real_images=real, steps=3,
            batch_size=2, params=params, noise_std=2.0, log_every=1,
        )
        assert len(losses) >= 2
        assert all(np.isfinite(l) for _, l in losses)
