"""Pallas fused-tail kernels: equivalence with the jnp reference path.

Runs the kernels in interpreter mode on CPU (SURVEY.md §4 implication (3)
pattern: exercise device-code logic without a TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.ops import pallas_kernels as pk
from pnp_admm_cnc_mri_tpu.ops import prox


@pytest.fixture(autouse=True)
def force_interpret():
    pk.FORCE_INTERPRET = True
    yield
    pk.FORCE_INTERPRET = False


def test_l1_tail_matches_jnp(rng):
    x = jnp.asarray(rng.normal(size=(3, 8, 128)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(3, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 8, 128)).astype(np.float32))
    c = 0.015 * 0.1
    z_k, w_k = pk.l1_tail(x, z, w, c)
    z_ref = prox.soft(x + w, c)
    w_ref = w + x - z_ref
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref), rtol=1e-6)


def test_cnc_tail_matches_jnp(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 256)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, 16, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 16, 256)).astype(np.float32))
    alpha, rho, lam, b = 0.45, 0.05, 0.5, 64.0
    z_k, w_k = pk.cnc_tail(x, z, w, alpha, rho, lam, b)
    z_ref = prox.cnc_update(z, x + w, alpha, rho, lam, b)
    w_ref = w + x - z_ref
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref), rtol=1e-5, atol=1e-6)


def test_untileable_shape_falls_back(rng):
    x = jnp.asarray(rng.normal(size=(5, 7, 33)).astype(np.float32))
    z_k, w_k = pk.l1_tail(x, x, x, 0.1)
    assert z_k.shape == x.shape


def test_solver_fused_equals_unfused(rng):
    """admm_l1(fused=True) through the scan must equal fused=False."""
    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.solvers import admm

    img = rng.random((2, 32, 128))
    mask = (rng.random((32, 128)) < 0.3).astype(np.float64)
    noise = 0.2 * (rng.normal(size=(32, 128)) + 1j * rng.normal(size=(32, 128)))
    y = jnp.asarray(np.fft.fft2(img, axes=(-2, -1)) * mask + noise, jnp.complex64)
    m = jnp.asarray(mask, jnp.float32)
    cfg = ADMMConfig(iter_num=10)
    # Single-step equivalence is bit-exact; across iterations a 1-ulp
    # difference at a soft-threshold boundary can flip an element, so the
    # whole-solve comparison allows a tiny absolute budget.
    a, _ = admm.admm_l1(y, m, cfg, dtype=jnp.float32, fused=True)
    b, _ = admm.admm_l1(y, m, cfg, dtype=jnp.float32, fused=False)
    d = np.abs(np.asarray(a.x) - np.asarray(b.x))
    assert d.max() < 5e-3 and d.mean() < 1e-5, (d.max(), d.mean())
    a, _ = admm.admm_cnc(y, m, cfg, dtype=jnp.float32, fused=True)
    b, _ = admm.admm_cnc(y, m, cfg, dtype=jnp.float32, fused=False)
    d = np.abs(np.asarray(a.x) - np.asarray(b.x))
    assert d.max() < 5e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def test_full_iteration_kernel_matches_solver(rng):
    """The round-5 full-iteration DC kernel (ops/pallas_dc.py, measured
    and rejected on chip — docs/PERF.md) stays math-equal to the regular
    matmul-DC solver in interpret mode."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.ops import pallas_dc
    from pnp_admm_cnc_mri_tpu.solvers import admm

    b, n = 4, 64
    img = rng.random((b, n, n))
    mask = (rng.random((n, n)) < 0.3).astype(np.float64)
    y = jnp.asarray(np.fft.fft2(img, axes=(-2, -1)) * mask, jnp.complex64)
    mj = jnp.asarray(mask, jnp.float32)
    cfg = ADMMConfig(iter_num=8, lam=0.1, rho=0.015)

    ref, _ = admm.admm_l1(y, mj, cfg, dtype=jnp.float32,
                          dc_method="matmul", fused=False)
    x_k, _, _ = pallas_dc.admm_l1_fused_kernel(y, mj, cfg, block=2,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(ref.x),
                               atol=2e-6)
