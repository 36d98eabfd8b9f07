"""Multi-device mesh tests on the virtual 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.parallel import mesh as mesh_lib
from pnp_admm_cnc_mri_tpu.parallel import reductions
from pnp_admm_cnc_mri_tpu.solvers import admm


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(n_data=8)


def _batch(rng, b=16, n=32):
    imgs = rng.random((b, n, n))
    mask = (rng.random((n, n)) < 0.3).astype(np.float64)
    noise = 0.3 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    y = np.fft.fft2(imgs, axes=(-2, -1)) * mask + noise
    return y.astype(np.complex64), mask.astype(np.float32)


class TestShardedSolve:
    def test_sharded_equals_unsharded(self, mesh8, rng):
        y, mask = _batch(rng)
        cfg = ADMMConfig(iter_num=10)

        y_sh = jax.device_put(jnp.asarray(y), NamedSharding(mesh8, P("data")))
        m_sh = jax.device_put(jnp.asarray(mask), NamedSharding(mesh8, P()))

        @jax.jit
        def solve(y, m):
            final, _ = admm.admm_l1(y, m, cfg, dtype=jnp.float32)
            return final.x

        x_sh = solve(y_sh, m_sh)
        # the result keeps the data sharding
        assert x_sh.sharding.spec == P("data")
        x_un = solve(jnp.asarray(y), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_un), rtol=2e-6, atol=1e-6)

    def test_pad_to_multiple(self, rng):
        x = rng.random((13, 4, 4))
        padded, n = mesh_lib.pad_to_multiple(x, 8)
        assert padded.shape[0] == 16 and n == 13
        np.testing.assert_array_equal(padded[:13], x)
        np.testing.assert_array_equal(padded[13:], x[:3])


class TestReductions:
    def test_converged_fraction_psum(self, mesh8, rng):
        from jax import shard_map

        res = jnp.asarray(rng.random(16).astype(np.float32))

        f = shard_map(
            lambda r: reductions.converged_fraction(r, 0.5),
            mesh=mesh8,
            in_specs=P("data"),
            out_specs=P(),
        )
        got = float(f(res))
        want = float((np.asarray(res) < 0.5).mean())
        assert abs(got - want) < 1e-6

    def test_global_residual_mean(self, mesh8, rng):
        from jax import shard_map

        x = jnp.asarray(rng.random((16, 8, 8)).astype(np.float32))
        z = jnp.asarray(rng.random((16, 8, 8)).astype(np.float32))

        f = shard_map(
            lambda a, b: reductions.global_mean(
                jnp.mean(reductions.primal_residual_norm(a, b))
            ),
            mesh=mesh8,
            in_specs=(P("data"), P("data")),
            out_specs=P(),
        )
        got = float(f(x, z))
        want = float(np.mean(np.sqrt(np.sum((np.asarray(x) - np.asarray(z)) ** 2, axis=(1, 2)))))
        np.testing.assert_allclose(got, want, rtol=1e-6)
