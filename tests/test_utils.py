"""Checkpoint/resume + profiling harness tests."""

import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.ops import prox
from pnp_admm_cnc_mri_tpu.solvers import admm
from pnp_admm_cnc_mri_tpu.utils import checkpoint, profiling


class TestCheckpoint:
    def test_round_trip(self, rng, tmp_path):
        state = admm.ADMMState(
            x=rng.random((2, 8, 8)), z=rng.random((2, 8, 8)), w=rng.random((2, 8, 8))
        )
        cfg = ADMMConfig(iter_num=30, lam=0.1, rho=0.015)
        p = str(tmp_path / "ck.npz")
        checkpoint.save_state(p, state, 12, cfg)
        s2, it, cfg2 = checkpoint.load_state(p)
        assert it == 12 and cfg2 == cfg
        np.testing.assert_array_equal(s2.x, state.x)

    def test_resume_matches_uninterrupted(self, rng, tmp_path):
        """Run 10 iters, checkpoint, resume to 30 == straight 30-iter run."""
        img = rng.random((16, 16))
        mask = (rng.random((16, 16)) < 0.4).astype(np.float64)
        noise = 0.2 * (rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16)))
        y = jnp.asarray(np.fft.fft2(img) * mask + noise)
        m = jnp.asarray(mask)
        cfg = ADMMConfig(iter_num=30, lam=0.1, rho=0.015)

        def z_update(i, x, z, w):
            return prox.soft(x + w, cfg.rho * cfg.lam)

        # straight run (f64 on CPU)
        full, _ = admm.run_admm(y, m, 30, cfg.rho, z_update, dtype=jnp.float64)

        # interrupted run
        part, _ = admm.run_admm(y, m, 10, cfg.rho, z_update, dtype=jnp.float64)
        p = str(tmp_path / "ck.npz")
        checkpoint.save_state(p, part, 10, cfg)
        resumed, cfg2 = checkpoint.resume_admm(p, y, m, z_update)
        np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x), rtol=1e-12)


class TestProfiling:
    def test_phase_timers(self):
        t = profiling.PhaseTimers()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        rep = t.report()
        assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1

    def test_device_time(self):
        f = lambda x: x * 2
        dt = profiling.device_time(f, jnp.ones((64, 64)))
        assert dt >= 0.0
