"""Denoiser training: loss decrease, sharded step equivalence, npz round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN, FDnCNN
from pnp_admm_cnc_mri_tpu.train import data as data_mod, trainer


@pytest.fixture(scope="module")
def patches(rng=None):
    r = np.random.default_rng(7)
    imgs = [r.random((64, 64)) for _ in range(4)]
    # smooth them so there's structure to learn
    from scipy.ndimage import gaussian_filter

    imgs = [gaussian_filter(im, 3.0) for im in imgs]
    return data_mod.extract_patches(imgs, patch=16, stride=16)


class TestData:
    def test_patches_shape(self, patches):
        assert patches.shape[1:] == (16, 16)
        assert patches.dtype == np.float32

    def test_batches_deterministic(self, patches):
        a = next(data_mod.batches(patches, 8, 0.1, seed=3))
        b = next(data_mod.batches(patches, 8, 0.1, seed=3))
        np.testing.assert_array_equal(a[0], b[0])

    def test_sigma_range_sampling(self, patches):
        noisy, clean, sig = next(data_mod.batches(patches, 8, (0.01, 0.3), seed=0))
        assert sig.min() >= 0.01 and sig.max() <= 0.3
        assert noisy.shape == (8, 16, 16, 1)


class TestTraining:
    def test_loss_decreases_dncnn(self, patches):
        model = DnCNN(out_nc=1, nc=8, nb=4)
        params, losses = trainer.train_denoiser(
            model, patches, 0.1, steps=60, batch_size=16, log_every=10,
            cfg=trainer.TrainConfig(learning_rate=1e-3),
        )
        first = losses[0][1]
        last = losses[-1][1]
        assert last < first * 0.8, losses

    def test_ondevice_loss_decreases(self, patches):
        model = DnCNN(out_nc=1, nc=8, nb=4)
        params, losses = trainer.train_denoiser_ondevice(
            model, patches, 0.1, steps=60, batch_size=16, log_every=10,
            cfg=trainer.TrainConfig(learning_rate=1e-3),
        )
        assert losses[-1][1] < losses[0][1] * 0.8, losses

    def test_ondevice_dihedral_matches_host_modes(self, patches):
        # the traced dihedral must agree with data.augment_batch per mode
        p = jnp.asarray(patches[:1, ..., None])
        for m in range(8):
            ours = np.asarray(trainer._dihedral(p[0], jnp.int32(m)))
            rng = np.random.default_rng(0)
            host = patches[:1]
            k = m % 4
            host = np.rot90(host, k, axes=(1, 2))
            if m >= 4:
                host = host[:, ::-1, :]
            np.testing.assert_array_equal(ours[..., 0], host[0])

    def test_ondevice_staging_chunked(self, patches):
        corpus = trainer.stage_to_device(patches, chunk_bytes=patches[0].nbytes * 3)
        assert corpus.shape == patches.shape
        np.testing.assert_array_equal(np.asarray(corpus), patches)

    def test_conditioned_fdncnn_step(self, patches):
        model = FDnCNN(out_nc=1, nc=8, nb=4)
        params, losses = trainer.train_denoiser(
            model, patches, (0.05, 0.2), steps=10, batch_size=8,
            conditioned=True, log_every=5,
        )
        assert np.isfinite(losses[-1][1])

    def test_sharded_step_matches_unsharded(self, patches):
        from pnp_admm_cnc_mri_tpu.parallel import mesh as mesh_lib

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = mesh_lib.make_mesh(n_data=2, n_space=2, devices=jax.devices()[:4])

        model = DnCNN(out_nc=1, nc=8, nb=4)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        optimizer = trainer.make_optimizer(trainer.TrainConfig(learning_rate=1e-3))
        loss_fn = trainer.make_loss_fn(model.apply, "l2")
        step = trainer.make_train_step(loss_fn, optimizer)

        rng = np.random.default_rng(0)
        noisy = rng.standard_normal((8, 16, 16, 1)).astype(np.float32)
        clean = rng.standard_normal((8, 16, 16, 1)).astype(np.float32)
        sig = np.full((8, 1, 1, 1), 0.1, np.float32)

        # unsharded
        p1, o1 = params, optimizer.init(params)
        p1, o1, l1 = step(p1, o1, jnp.asarray(noisy), jnp.asarray(clean), jnp.asarray(sig))

        # dp x tp sharded
        p2 = trainer.shard_params_tp(params, mesh)
        o2 = optimizer.init(p2)
        batch = trainer.shard_batch_dp((noisy, clean, sig), mesh)
        p2, o2, l2 = step(p2, o2, *batch)

        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        flat1 = jax.tree.leaves(p1)
        flat2 = jax.tree.leaves(p2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_trained_weights_usable_in_pnp(self, patches, tmp_path):
        """Train briefly, save npz, load through build_denoiser, run PnP."""
        from pnp_admm_cnc_mri_tpu.models import convert
        from pnp_admm_cnc_mri_tpu.priors import denoiser as dn
        from pnp_admm_cnc_mri_tpu.solvers import admm
        from pnp_admm_cnc_mri_tpu.config import ADMMConfig

        model = DnCNN(out_nc=1, nc=64, nb=17)
        params, _ = trainer.train_denoiser(
            model, patches, 15 / 255.0, steps=5, batch_size=8, log_every=5
        )
        path = str(tmp_path / "dncnn_tiny.npz")
        convert.save_npz(jax.tree.map(np.asarray, params), path)

        denoise = dn.build_denoiser("dncnn_15", weights=path)
        r = np.random.default_rng(0)
        img = r.random((32, 32))
        mask = (r.random((32, 32)) < 0.4).astype(np.float64)
        noise = 0.3 * (r.normal(size=(32, 32)) + 1j * r.normal(size=(32, 32)))
        y = jnp.asarray(np.fft.fft2(img) * mask + noise, jnp.complex64)
        final, _ = admm.pnp_admm_l1(
            y, jnp.asarray(mask, jnp.float32), ADMMConfig(iter_num=3, rho=0.15), denoise
        )
        assert np.isfinite(np.asarray(final.x)).all()


def test_multiscale_patches(patches):
    r = np.random.default_rng(3)
    imgs = [r.random((64, 64)) for _ in range(2)]
    single = data_mod.extract_patches(imgs, patch=16, stride=16)
    multi = data_mod.extract_patches_multiscale(imgs, patch=16, stride=16,
                                                scales=(1.0, 0.5))
    assert multi.shape[0] > single.shape[0]
    assert multi.shape[1:] == (16, 16)


class TestCleanCorpusGenerators:
    """Synthetic corpus generators (train/corpus.py): deterministic,
    [0,1]-ranged, right shapes — the leakage-free training data sources."""

    def test_generators_shapes_range_determinism(self):
        from pnp_admm_cnc_mri_tpu.train import corpus

        for fn, kw in [
            (corpus.dead_leaves, dict(n=2, size=64, seed=3)),
            (corpus.gaussian_fields, dict(n=2, size=64, seed=3)),
            (corpus.mri_phantoms, dict(n=2, size=64, seed=3)),
        ]:
            a = fn(**kw)
            b = fn(**kw)
            assert a.shape == (2, 64, 64) and a.dtype == np.float32
            assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0
            np.testing.assert_array_equal(a, b)  # seeded => reproducible
            # non-degenerate content
            assert float(a.std()) > 0.01

    def test_phantoms_have_anatomy_like_support(self):
        """Phantoms are bright ovals on a dark background (the MRI-like
        layout): the border stays dark, the center is bright."""
        from pnp_admm_cnc_mri_tpu.train import corpus

        p = corpus.mri_phantoms(3, 96, seed=5)
        border = np.concatenate([p[:, 0, :], p[:, -1, :], p[:, :, 0],
                                 p[:, :, -1]], axis=-1)
        center = p[:, 36:60, 36:60]
        assert float(border.mean()) < 0.1
        assert float(center.mean()) > 0.25


class TestSynthOnDevice:
    """On-device procedural generators (train/synth.py) + stream trainer."""

    def test_jax_generators_shapes_range_determinism(self):
        import jax
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.train import synth

        key = jax.random.PRNGKey(3)
        for fn, kw in [
            (synth.dead_leaves, dict(n=2, size=64, n_disks=200)),
            (synth.gaussian_fields, dict(n=2, size=64)),
            (synth.mri_phantoms, dict(n=2, size=64)),
        ]:
            a = np.asarray(fn(key, **kw))
            b = np.asarray(fn(key, **kw))
            assert a.shape == (2, 64, 64)
            assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0
            np.testing.assert_array_equal(a, b)  # keyed => reproducible
            assert float(a.std()) > 0.01

    def test_generator_mixture_jits_and_permutes(self):
        import jax

        from pnp_admm_cnc_mri_tpu.train import synth

        gen = synth.make_generator(size=64, n_disks=150)
        buf = jax.jit(lambda k: gen(k, 8))(jax.random.PRNGKey(0))
        assert buf.shape == (8, 64, 64)
        buf2 = jax.jit(lambda k: gen(k, 8))(jax.random.PRNGKey(1))
        assert float(np.abs(np.asarray(buf) - np.asarray(buf2)).max()) > 0.01

    def test_elastic_warps_cover_seed_statistics(self):
        import jax
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.train import synth

        rng = np.random.default_rng(0)
        seeds = jnp.asarray(rng.random((2, 96, 96)), jnp.float32)
        w = np.asarray(synth.elastic_warps(jax.random.PRNGKey(0), seeds, 3,
                                           size=64))
        assert w.shape == (3, 64, 64)
        assert float(w.min()) >= 0.0 and float(w.max()) <= 1.0
        assert float(w.std()) > 0.05

    def test_stream_trainer_loss_decreases(self):
        from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN
        from pnp_admm_cnc_mri_tpu.train import synth, trainer

        model = DnCNN(out_nc=1, nc=8, nb=3)
        gen = synth.make_generator(size=48, n_disks=100)
        params, losses = trainer.train_denoiser_stream(
            model, gen, 25 / 255.0, steps=60, batch_size=8, patch=24,
            buffer_images=16, refresh_every=30, scan_steps=10,
            log_every=10, seed=0,
            cfg=trainer.TrainConfig(learning_rate=1e-3),
        )
        assert losses[-1][1] < losses[0][1]

    def test_stream_trainer_fixed_buffer_is_scaling_knob(self):
        """refresh_every=0 freezes the first buffer (corpus-size point)."""
        from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN
        from pnp_admm_cnc_mri_tpu.train import synth, trainer

        model = DnCNN(out_nc=1, nc=8, nb=2)
        gen = synth.make_generator(size=48, n_disks=100)
        params, losses = trainer.train_denoiser_stream(
            model, gen, 25 / 255.0, steps=20, batch_size=4, patch=24,
            buffer_images=8, refresh_every=0, scan_steps=1, ema_decay=0.99,
            log_every=5, seed=0,
            cfg=trainer.TrainConfig(learning_rate=1e-3),
        )
        assert len(losses) >= 3

    def test_stream_trainer_distills_toward_teacher(self):
        """Pure distillation (weight=1) regresses the TEACHER's output,
        not the clean target: with a teacher that scales its input by a
        learnable-free constant, the trained student tracks noisy*gain
        far better than the clean image."""
        import jax
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN
        from pnp_admm_cnc_mri_tpu.train import synth, trainer

        model = DnCNN(out_nc=1, nc=8, nb=3)
        gen = synth.make_generator(size=48, n_disks=100)

        def teacher_apply(tp, noisy, sig):
            return noisy * tp["gain"]

        params, losses = trainer.train_denoiser_stream(
            model, gen, 25 / 255.0, steps=60, batch_size=8, patch=24,
            buffer_images=16, refresh_every=0, scan_steps=10, log_every=10,
            seed=0, cfg=trainer.TrainConfig(learning_rate=1e-3),
            teacher_apply=teacher_apply, teacher_params={"gain": 0.5},
            distill_weight=1.0,
        )
        assert losses[-1][1] < losses[0][1]
        key = jax.random.PRNGKey(7)
        clean = jnp.clip(jax.random.uniform(key, (2, 24, 24, 1)), 0, 1)
        noisy = clean + 0.1 * jax.random.normal(key, clean.shape)
        pred = model.apply(params, noisy)
        err_teacher = float(jnp.mean((pred - 0.5 * noisy) ** 2))
        err_clean = float(jnp.mean((pred - clean) ** 2))
        assert err_teacher < 0.5 * err_clean

    def test_stream_trainer_distill_weight_blends_clean_loss(self):
        """distill_weight=0 must reduce to the plain supervised stream
        loss (teacher ignored) — plumbing guard for the blend formula."""
        from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN
        from pnp_admm_cnc_mri_tpu.train import synth, trainer

        model = DnCNN(out_nc=1, nc=8, nb=2)
        gen = synth.make_generator(size=48, n_disks=100)

        def bad_teacher(tp, noisy, sig):
            return noisy * 0.0 + 99.0  # would explode the loss if weighted

        _, losses = trainer.train_denoiser_stream(
            model, gen, 25 / 255.0, steps=10, batch_size=4, patch=24,
            buffer_images=8, refresh_every=0, scan_steps=1, log_every=5,
            seed=0, cfg=trainer.TrainConfig(learning_rate=1e-3),
            teacher_apply=bad_teacher, teacher_params={},
            distill_weight=0.0,
        )
        assert losses[-1][1] < 1.0  # pure clean loss scale, teacher ignored
