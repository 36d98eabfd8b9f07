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


class TestVisualize:
    """Zoom-box display helpers (reference utils/utils.py:58-109)."""

    def test_draw_box_outline(self):
        import numpy as np

        from pnp_admm_cnc_mri_tpu.utils.visualize import draw_box

        img = np.zeros((32, 32), np.float32)
        out = draw_box(img, (4, 6), (20, 26), thickness=2)
        assert img.sum() == 0  # input untouched
        assert (out[6:26, 4:6] == 1.0).all()  # left edge
        assert (out[6:8, 4:20] == 1.0).all()  # top edge
        assert (out[10:22, 8:16] == 0).all()  # interior clear

    def test_enlarge_region_shapes_and_content(self):
        import numpy as np

        from pnp_admm_cnc_mri_tpu.utils.visualize import enlarge_region

        rng = np.random.default_rng(0)
        img = rng.random((40, 48)).astype(np.float32)
        annotated, enlarged = enlarge_region(img, (8, 10), (24, 30))
        assert annotated.shape == img.shape and enlarged.shape == img.shape
        # enlargement resamples only the crop: interior values stay in range
        crop = img[10:30, 8:24]
        inner = enlarged[4:-4, 4:-4]
        assert inner.min() >= crop.min() - 1e-6
        assert inner.max() <= crop.max() + 1e-6

    def test_uint8_roundtrip(self):
        import numpy as np

        from pnp_admm_cnc_mri_tpu.utils.visualize import enlarge_region

        img = (np.arange(64 * 64, dtype=np.uint8)).reshape(64, 64)
        annotated, enlarged = enlarge_region(img, (10, 10), (30, 30))
        assert annotated.dtype == np.uint8 and enlarged.dtype == np.uint8
        assert (annotated[10:30, 10:12] == 255).all()
