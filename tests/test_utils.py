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


class TestImageConversions:
    """Color/augment helpers vs the reference's literal formulas
    (utils_image.py:315-530; the module itself needs torchvision and
    cannot be imported, so the formulas are inlined as oracles)."""

    def _ref_rgb2ycbcr(self, img, only_y=True):
        in_img_type = img.dtype
        img = img.copy().astype(np.float64)
        if in_img_type != np.uint8:
            img *= 255.0
        if only_y:
            rlt = np.dot(img, [65.481, 128.553, 24.966]) / 255.0 + 16.0
        else:
            rlt = np.matmul(img, [[65.481, -37.797, 112.0],
                                  [128.553, -74.203, -93.786],
                                  [24.966, 112.0, -18.214]]) / 255.0 + [16, 128, 128]
        if in_img_type == np.uint8:
            rlt = rlt.round()
        else:
            rlt /= 255.0
        return rlt.astype(in_img_type)

    def test_rgb2ycbcr_uint8_and_float(self, rng):
        from pnp_admm_cnc_mri_tpu.data import images

        u8 = (rng.random((6, 5, 3)) * 255).astype(np.uint8)
        np.testing.assert_array_equal(images.rgb2ycbcr(u8),
                                      self._ref_rgb2ycbcr(u8))
        np.testing.assert_array_equal(images.rgb2ycbcr(u8, only_y=False),
                                      self._ref_rgb2ycbcr(u8, only_y=False))
        f = rng.random((6, 5, 3)).astype(np.float32)
        np.testing.assert_allclose(images.rgb2ycbcr(f),
                                   self._ref_rgb2ycbcr(f), atol=1e-6)

    def test_bgr_is_reversed_rgb(self, rng):
        from pnp_admm_cnc_mri_tpu.data import images

        f = rng.random((4, 4, 3)).astype(np.float64)
        np.testing.assert_allclose(images.bgr2ycbcr(f),
                                   images.rgb2ycbcr(f[..., ::-1]), atol=1e-12)
        full_b = images.bgr2ycbcr(f, only_y=False)
        full_r = images.rgb2ycbcr(f[..., ::-1], only_y=False)
        np.testing.assert_allclose(full_b, full_r, atol=1e-12)

    def test_ycbcr_roundtrip(self, rng):
        from pnp_admm_cnc_mri_tpu.data import images

        rgb = (rng.random((8, 8, 3)) * 0.6 + 0.2).astype(np.float64)
        back = images.ycbcr2rgb(images.rgb2ycbcr(rgb, only_y=False))
        np.testing.assert_allclose(back, rgb, atol=2e-3)

    def test_input_not_mutated(self, rng):
        """Documented deviation: the reference's float path mutates the
        caller's array in place; ours must not."""
        from pnp_admm_cnc_mri_tpu.data import images

        f = rng.random((4, 4, 3))
        f0 = f.copy()
        images.rgb2ycbcr(f)
        np.testing.assert_array_equal(f, f0)

    def test_augment_img_modes(self, rng):
        from pnp_admm_cnc_mri_tpu.data import images

        img = rng.random((5, 7))
        expected = [
            img,
            np.flipud(np.rot90(img)),
            np.flipud(img),
            np.rot90(img, k=3),
            np.flipud(np.rot90(img, k=2)),
            np.rot90(img),
            np.rot90(img, k=2),
            np.flipud(np.rot90(img, k=3)),
        ]
        for mode in range(8):
            np.testing.assert_array_equal(images.augment_img(img, mode),
                                          expected[mode])
        # all 8 are distinct on an asymmetric image
        flats = {images.augment_img(img, m).tobytes() for m in range(8)}
        assert len(flats) == 8

    def test_shave_and_uint16(self, rng):
        from pnp_admm_cnc_mri_tpu.data import images

        img = rng.random((8, 10, 3))
        np.testing.assert_array_equal(images.shave(img, 2), img[2:6, 2:8])
        u16 = images.single2uint16(np.array([0.0, 0.5, 1.0, 1.5]))
        assert u16.dtype == np.uint16
        np.testing.assert_array_equal(u16, [0, 32768, 65535, 65535])
        np.testing.assert_allclose(images.uint162single(u16),
                                   [0, 32768 / 65535, 1, 1], atol=1e-7)

    def test_imread_uint_and_channel_convert(self, tmp_path, rng):
        from pnp_admm_cnc_mri_tpu.data import images
        import cv2

        gray = (rng.random((6, 6)) * 255).astype(np.uint8)
        p = str(tmp_path / "g.png")
        cv2.imwrite(p, gray)
        one = images.imread_uint(p, n_channels=1)
        assert one.shape == (6, 6, 1)
        np.testing.assert_array_equal(one[..., 0], gray)
        three = images.imread_uint(p, n_channels=3)
        assert three.shape == (6, 6, 3)
        np.testing.assert_array_equal(three[..., 0], three[..., 2])

        bgr = (rng.random((4, 4, 3)) * 255).astype(np.uint8)
        [g] = images.channel_convert(3, "gray", [bgr])
        assert g.shape == (4, 4, 1)
        [yy] = images.channel_convert(3, "y", [bgr])
        assert yy.shape == (4, 4, 1)
        [back] = images.channel_convert(1, "RGB", [gray])
        assert back.shape == (6, 6, 3)
        assert images.is_image_file("a.png") and not images.is_image_file("a.txt")


class TestDeviceComplex:
    def test_cpu_path_exact(self, rng):
        import jax.numpy as jnp
        from pnp_admm_cnc_mri_tpu.cli.experiments import _device_complex

        host = rng.random((4, 4)) + 1j * rng.random((4, 4))
        out = _device_complex(host, jnp.complex128, jnp.float64)
        assert out.dtype == jnp.complex128
        np.testing.assert_allclose(np.asarray(out), host, rtol=0, atol=0)
        out32 = _device_complex(host, jnp.complex64, jnp.float32)
        assert out32.dtype == jnp.complex64
        np.testing.assert_allclose(np.asarray(out32),
                                   host.astype(np.complex64), rtol=0, atol=0)


class TestDisplayHelpers:
    """imshow/surf (reference utils_image.py:33-47) in headless mode."""

    def test_imshow_returns_figure(self):
        from pnp_admm_cnc_mri_tpu.utils import visualize

        fig = visualize.imshow(np.random.rand(8, 8), title="t", cbar=True,
                               show=False)
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_surf_arbitrary_grid(self):
        from pnp_admm_cnc_mri_tpu.utils import visualize

        fig = visualize.surf(np.random.rand(9, 13), show=False)
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestFISTACheckpoint:
    def test_round_trip_and_resume_identical(self, rng, tmp_path):
        """Snapshot at iteration k, resume to N: identical to an
        uninterrupted N-iteration FISTA-L1 run (momentum t included)."""
        import jax
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod
        from pnp_admm_cnc_mri_tpu.solvers import fista
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        n = 24
        img = rng.random((n, n))
        mask = (rng.random((n, n)) < 0.4).astype(np.float64)
        y = jnp.asarray(np.fft.fft2(img) * mask, jnp.complex128)
        mj = jnp.asarray(mask)
        prox_fn = lambda i, u: prox_mod.soft(u, 1e-3)

        full, _ = fista.run_fista(y, mj, 20, prox_fn, dtype=jnp.float64)

        half, _ = fista.run_fista(y, mj, 8, prox_fn, dtype=jnp.float64)
        p = str(tmp_path / "fista.npz")
        ckpt.save_fista_state(p, half, 8, meta={"iter_num": 20, "step": 1.0})
        resumed, meta = ckpt.resume_fista(p, y, mj, prox_fn)
        assert meta["iter_num"] == 20
        np.testing.assert_allclose(np.asarray(resumed.x),
                                   np.asarray(full.x), atol=1e-12)
        np.testing.assert_allclose(float(resumed.t), float(full.t),
                                   rtol=1e-12)


class TestIterateCheckpoints:
    """HQS/RED single-iterate snapshots (save_iterate_state + resumes)."""

    def _scenario(self, rng, n=24):
        import jax.numpy as jnp

        img = rng.random((n, n))
        mask = (rng.random((n, n)) < 0.4).astype(np.float64)
        y = jnp.asarray(np.fft.fft2(img) * mask, jnp.complex128)
        return y, jnp.asarray(mask)

    def test_hqs_resume_identical(self, rng, tmp_path):
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.ops import schedules
        from pnp_admm_cnc_mri_tpu.solvers import hqs
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        y, mj = self._scenario(rng)
        alphas, _ = schedules.get_rho_sigma(iter_num=12)
        den = lambda u, i: jnp.clip(u, 0.05, 0.95)

        full, _ = hqs.run_hqs(y, mj, 12, den, alphas, dtype=jnp.float64)
        half, _ = hqs.run_hqs(y, mj, 5, den, alphas[:5], dtype=jnp.float64)
        p = str(tmp_path / "hqs.npz")
        ckpt.save_iterate_state(p, half, 5, kind="hqs",
                                meta={"alphas": list(map(float, alphas))})
        resumed, _ = ckpt.resume_hqs(p, y, mj, den)
        np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                                   atol=1e-12)

    def test_red_resume_identical_and_kind_guard(self, rng, tmp_path):
        import jax.numpy as jnp
        import pytest

        from pnp_admm_cnc_mri_tpu.solvers import red
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        y, mj = self._scenario(rng)
        den = lambda u, i: jnp.clip(u, 0.05, 0.95)
        kw = dict(lam=0.4, step=0.9, variant="fp")

        full, _ = red.run_red(y, mj, 12, den, dtype=jnp.float64, **kw)
        half, _ = red.run_red(y, mj, 5, den, dtype=jnp.float64, **kw)
        p = str(tmp_path / "red.npz")
        ckpt.save_iterate_state(p, half, 5, kind="red",
                                meta={"iter_num": 12, **kw})
        resumed, _ = ckpt.resume_red(p, y, mj, den)
        np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                                   atol=1e-12)
        with pytest.raises(ValueError, match="checkpoint"):
            ckpt.resume_hqs(p, y, mj, den)

    def test_consensus_hqs_clamp_false_round_trip(self, rng, tmp_path):
        """save_consensus_hqs records clamp automatically: a clamp=False
        run resumes with clamp=False (not the silent clamp=True default
        the advisor flagged)."""
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.ops import schedules
        from pnp_admm_cnc_mri_tpu.parallel import consensus
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        n = 24
        img = rng.random((n, n))
        masks = np.stack([(rng.random((n, n)) < 0.3).astype(np.float64)
                          for _ in range(3)])
        ys = jnp.asarray(np.fft.fft2(img[None], axes=(-2, -1)) * masks,
                         jnp.complex128)
        mj = jnp.asarray(masks)
        alphas, _ = schedules.get_rho_sigma(iter_num=12)
        # denoiser output leaves [0,1] so clamp on/off changes the result
        den = lambda u, i: 1.2 * u - 0.05

        full = consensus.run_consensus_hqs(
            ys, mj, 12, den, clamp=False, dtype=jnp.float64, alphas=alphas)
        half = consensus.run_consensus_hqs(
            ys, mj, 5, den, clamp=False, dtype=jnp.float64, alphas=alphas[:5])
        p = str(tmp_path / "chqs_noclamp.npz")
        ckpt.save_consensus_hqs(p, half, 5, alphas, clamp=False)
        resumed, meta = ckpt.resume_consensus_hqs(p, ys, mj, den)
        assert meta["clamp"] is False
        np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                                   atol=1e-12)

    def test_consensus_admm_resume_identical(self, rng, tmp_path):
        """Consensus-ADMM: snapshot (z, per-obs duals w) at iteration k,
        resume to N == uninterrupted N-iteration run (z AND x)."""
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.config import ADMMConfig
        from pnp_admm_cnc_mri_tpu.parallel import consensus
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        n = 24
        img = rng.random((n, n))
        masks = np.stack([(rng.random((n, n)) < 0.3).astype(np.float64)
                          for _ in range(3)])
        ys = jnp.asarray(np.fft.fft2(img[None], axes=(-2, -1)) * masks,
                         jnp.complex128)
        mj = jnp.asarray(masks)
        cfg = ADMMConfig(iter_num=14, lam=0.1, rho=0.05)

        z_full, x_full = consensus.run_consensus(ys, mj, cfg,
                                                 dtype=jnp.float64)
        cfg5 = ADMMConfig(iter_num=6, lam=0.1, rho=0.05)
        z_h, _x_h, w_h = consensus.run_consensus(
            ys, mj, cfg5, dtype=jnp.float64, return_state=True)
        p = str(tmp_path / "cadmm.npz")
        ckpt.save_consensus_state(p, z_h, w_h, 6, cfg=cfg)
        z_r, x_r, cfg_r = ckpt.resume_consensus_admm(p, ys, mj)
        assert cfg_r.iter_num == 14
        np.testing.assert_allclose(np.asarray(z_r), np.asarray(z_full),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(x_r), np.asarray(x_full),
                                   atol=1e-12)

    def test_consensus_fista_resume_identical_and_family_guard(
            self, rng, tmp_path):
        """Consensus-FISTA: snapshot (x, v, momentum t) at iteration k,
        resume to N == uninterrupted run; the family tag stops
        resume_fista / resume_consensus_fista cross-resuming."""
        import jax.numpy as jnp
        import pytest

        from pnp_admm_cnc_mri_tpu.ops import prox as prox_mod
        from pnp_admm_cnc_mri_tpu.parallel import consensus
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        n = 24
        img = rng.random((n, n))
        masks = np.stack([(rng.random((n, n)) < 0.3).astype(np.float64)
                          for _ in range(3)])
        ys = jnp.asarray(np.fft.fft2(img[None], axes=(-2, -1)) * masks,
                         jnp.complex128)
        mj = jnp.asarray(masks)
        prox_fn = lambda i, u: prox_mod.soft(u, 1e-3)

        x_full = consensus.run_consensus_fista(
            ys, mj, 20, prox_fn, dtype=jnp.float64)
        half = consensus.run_consensus_fista(
            ys, mj, 8, prox_fn, dtype=jnp.float64, return_state=True)
        p = str(tmp_path / "cfista.npz")
        ckpt.save_consensus_fista(p, half, 8, iter_num=20)
        resumed, meta = ckpt.resume_consensus_fista(p, ys, mj, prox_fn)
        assert meta["iter_num"] == 20
        np.testing.assert_allclose(np.asarray(resumed.x),
                                   np.asarray(x_full), atol=1e-12)
        with pytest.raises(ValueError, match="consensus-FISTA"):
            ckpt.resume_fista(p, ys[0], mj[0], prox_fn)
        # and the reverse direction: a plain FISTA snapshot is refused
        p2 = str(tmp_path / "plain.npz")
        ckpt.save_fista_state(p2, half, 8, meta={"iter_num": 20})
        with pytest.raises(ValueError, match="not a consensus-FISTA"):
            ckpt.resume_consensus_fista(p2, ys, mj, prox_fn)

    def test_consensus_hqs_resume_identical(self, rng, tmp_path):
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.ops import schedules
        from pnp_admm_cnc_mri_tpu.parallel import consensus
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        n = 24
        img = rng.random((n, n))
        masks = np.stack([(rng.random((n, n)) < 0.3).astype(np.float64)
                          for _ in range(3)])
        ys = jnp.asarray(np.fft.fft2(img[None], axes=(-2, -1)) * masks,
                         jnp.complex128)
        mj = jnp.asarray(masks)
        alphas, _ = schedules.get_rho_sigma(iter_num=12)
        den = lambda u, i: jnp.clip(u, 0.05, 0.95)

        full = consensus.run_consensus_hqs(
            ys, mj, 12, den, dtype=jnp.float64, alphas=alphas)
        half = consensus.run_consensus_hqs(
            ys, mj, 5, den, dtype=jnp.float64, alphas=alphas[:5])
        p = str(tmp_path / "chqs.npz")
        ckpt.save_iterate_state(p, half, 5, kind="consensus_hqs",
                                meta={"alphas": list(map(float, alphas))})
        resumed, _ = ckpt.resume_consensus_hqs(p, ys, mj, den)
        np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                                   atol=1e-12)

    def test_batched_consensus_resume_identical(self, rng, tmp_path):
        """Batched (B, N, H, W) consensus runs resume identically.

        Regression for the round-4 advisor finding: the resume paths used
        the pre-batching observation-axis-0 convention (``z[None] - w``,
        ``sum(..., axis=0)``) while the solvers moved the observation
        axis to -3 — silently wrong when B == N (broadcast succeeds),
        shape error otherwise. Uses B=3 images x N=3 masks, the silent
        case."""
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.config import ADMMConfig
        from pnp_admm_cnc_mri_tpu.ops import schedules
        from pnp_admm_cnc_mri_tpu.parallel import consensus
        from pnp_admm_cnc_mri_tpu.utils import checkpoint as ckpt

        n, B, N = 24, 3, 3
        imgs = rng.random((B, n, n))
        masks = np.stack([(rng.random((n, n)) < 0.3).astype(np.float64)
                          for _ in range(N)])
        # (B, N, H, W): each image observed through every mask
        ys = jnp.asarray(
            np.fft.fft2(imgs[:, None], axes=(-2, -1)) * masks[None],
            jnp.complex128)
        mj = jnp.asarray(np.broadcast_to(masks[None], (B, N, n, n)))

        # --- consensus-ADMM ---
        cfg = ADMMConfig(iter_num=14, lam=0.1, rho=0.05)
        z_full, x_full = consensus.run_consensus(ys, mj, cfg,
                                                 dtype=jnp.float64)
        cfg5 = ADMMConfig(iter_num=6, lam=0.1, rho=0.05)
        z_h, _x_h, w_h = consensus.run_consensus(
            ys, mj, cfg5, dtype=jnp.float64, return_state=True)
        p = str(tmp_path / "cadmm_batched.npz")
        ckpt.save_consensus_state(p, z_h, w_h, 6, cfg=cfg)
        z_r, x_r, _cfg_r = ckpt.resume_consensus_admm(p, ys, mj)
        assert x_r.shape == (B, N, n, n)
        np.testing.assert_allclose(np.asarray(z_r), np.asarray(z_full),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(x_r), np.asarray(x_full),
                                   atol=1e-12)

        # --- consensus-HQS ---
        alphas, _ = schedules.get_rho_sigma(iter_num=12)
        den = lambda u, i: jnp.clip(u, 0.05, 0.95)
        full = consensus.run_consensus_hqs(
            ys, mj, 12, den, dtype=jnp.float64, alphas=alphas)
        half = consensus.run_consensus_hqs(
            ys, mj, 5, den, dtype=jnp.float64, alphas=alphas[:5])
        p2 = str(tmp_path / "chqs_batched.npz")
        ckpt.save_consensus_hqs(p2, half, 5, alphas)
        resumed, _ = ckpt.resume_consensus_hqs(p2, ys, mj, den)
        assert resumed.shape == (B, n, n)
        np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                                   atol=1e-12)
