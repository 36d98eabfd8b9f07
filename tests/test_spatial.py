"""Distributed 2-D FFT + spatially-sharded ADMM vs single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.parallel import mesh as mesh_lib, spatial
from pnp_admm_cnc_mri_tpu.solvers import admm


@pytest.fixture(scope="module")
def mesh_space():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    return mesh_lib.make_mesh(n_data=1, n_space=4, devices=jax.devices()[:4])


class TestDistributedFFT:
    def test_fft2_matches_reference(self, mesh_space, rng):
        x = rng.random((32, 64)).astype(np.float32)
        want = np.fft.fft2(x)

        f = jax.shard_map(
            lambda a: spatial.fft2_rows_to_cols(a, "space"),
            mesh=mesh_space,
            in_specs=P("space", None),
            out_specs=P(None, "space"),
        )
        x_d = jax.device_put(jnp.asarray(x), NamedSharding(mesh_space, P("space", None)))
        got = np.asarray(f(x_d))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_ifft_round_trip(self, mesh_space, rng):
        x = rng.random((32, 64)).astype(np.float32)

        def round_trip(a):
            return jnp.real(
                spatial.ifft2_cols_to_rows(spatial.fft2_rows_to_cols(a, "space"), "space")
            )

        f = jax.shard_map(
            round_trip, mesh=mesh_space, in_specs=P("space", None),
            out_specs=P("space", None),
        )
        x_d = jax.device_put(jnp.asarray(x), NamedSharding(mesh_space, P("space", None)))
        np.testing.assert_allclose(np.asarray(f(x_d)), x, rtol=1e-5, atol=1e-5)


class TestSpatialADMM:
    def test_matches_single_device_solver(self, mesh_space, rng):
        img = rng.random((64, 64))
        mask = (rng.random((64, 64)) < 0.3).astype(np.float64)
        noise = 0.3 * (rng.normal(size=(64, 64)) + 1j * rng.normal(size=(64, 64)))
        y = (np.fft.fft2(img) * mask + noise).astype(np.complex64)
        cfg = ADMMConfig(iter_num=15, lam=0.1, rho=0.015)

        x_spatial = np.asarray(
            spatial.spatial_admm_l1(jnp.asarray(y), jnp.asarray(mask), cfg, mesh_space)
        )
        final, _ = admm.admm_l1(
            jnp.asarray(y), jnp.asarray(mask, jnp.float32), cfg, fused=False
        )
        np.testing.assert_allclose(x_spatial, np.asarray(final.x), rtol=1e-4, atol=1e-4)


class TestCombinedMesh:
    def test_batched_and_spatially_sharded(self, rng):
        """2-D (data, space) mesh: batch sharded over data AND each image's
        H axis sharded over space simultaneously."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = mesh_lib.make_mesh(n_data=2, n_space=4, devices=jax.devices()[:8])

        imgs = rng.random((4, 32, 64))
        mask = (rng.random((32, 64)) < 0.3).astype(np.float64)
        noise = 0.3 * (rng.normal(size=(32, 64)) + 1j * rng.normal(size=(32, 64)))
        y = (np.fft.fft2(imgs, axes=(-2, -1)) * mask + noise).astype(np.complex64)
        cfg = ADMMConfig(iter_num=10, lam=0.1, rho=0.015)

        def local(y_l, m_l):
            # y_l: (B/2, H, W/4) spectrum-layout shard on each device
            from pnp_admm_cnc_mri_tpu.ops import prox

            la2 = 1.0 / (2.0 * cfg.rho)
            x0 = jnp.abs(spatial.ifft2_cols_to_rows(y_l, "space")).astype(jnp.float32)
            z, w = x0, jnp.zeros_like(x0)
            x = x0
            for _ in range(cfg.iter_num):
                vf = spatial.fft2_rows_to_cols((z - w).astype(jnp.float32), "space")
                blended = (la2 * vf + y_l) / (1.0 + la2)
                xf = jnp.where(m_l != 0, blended, vf)
                x = jnp.abs(jnp.real(spatial.ifft2_cols_to_rows(xf, "space"))).astype(jnp.float32)
                z = prox.soft(x + w, cfg.rho * cfg.lam)
                w = w + x - z
            return x

        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data", None, "space"), P(None, "space")),
            out_specs=P("data", "space", None),
        )
        from jax.sharding import NamedSharding

        y_d = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P("data", None, "space")))
        m_d = jax.device_put(jnp.asarray(mask, jnp.float32), NamedSharding(mesh, P(None, "space")))
        x_sh = np.asarray(f(y_d, m_d))

        final, _ = admm.admm_l1(
            jnp.asarray(y), jnp.asarray(mask, jnp.float32), cfg, fused=False,
            use_rfft=False,
        )
        np.testing.assert_allclose(x_sh, np.asarray(final.x), rtol=1e-4, atol=1e-4)
