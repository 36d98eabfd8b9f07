"""TPU-native BM3D: transform validity, denoising quality, oracle parity."""

import ctypes
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.priors.bm3d import core, transforms as tr

REF = "/root/reference"


def _install_pywt_stub():
    if "pywt" not in sys.modules:
        stub = types.ModuleType("pywt")

        def wavedec(data, wavelet, mode="periodization", level=None):
            assert mode == "periodization"
            return tr.wavedec_vector(np.asarray(data), wavelet, level)

        stub.wavedec = wavedec
        sys.modules["pywt"] = stub


def _preload_oracle_libs() -> bool:
    """dlopen the C BM3D dependency chain so the reference .so resolves."""
    cv_libs = "/opt/venv/lib/python3.12/site-packages/opencv_python.libs"
    try:
        for name in sorted(os.listdir(cv_libs)):
            if "gfortran" in name or "quadmath" in name:
                ctypes.CDLL(os.path.join(cv_libs, name), mode=ctypes.RTLD_GLOBAL)
        for name in sorted(os.listdir(cv_libs)):
            if "openblas" in name:
                ctypes.CDLL(os.path.join(cv_libs, name), mode=ctypes.RTLD_GLOBAL)
        return True
    except OSError:
        return False


class TestTransforms:
    def test_bior_matches_reference_norms_and_reconstructs(self):
        f, i = tr.transform_pair(8, "bior1.5")
        np.testing.assert_allclose(i @ f, np.eye(8), atol=1e-12)
        # The reference's hardcoded MATLAB matrix has row norms
        # [0.9717, 1.0275, 1, 1, 1, 1, 1, 1]; ours matches the same subband
        # structure with unit-norm finest rows (documented phase deviation).
        norms = np.sqrt((f**2).sum(axis=1))
        np.testing.assert_allclose(norms[4:], 1.0, atol=1e-12)

    @pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
    def test_bior_row_correspondence_with_reference(self):
        """Every reference basis row must be a scaled circular shift of one
        of ours (same subbands, different per-level phase convention)."""
        _install_pywt_stub()
        sys.path.insert(0, REF)
        from bm3d307.bm3d import _get_transf_matrix

        ref = np.asarray(_get_transf_matrix(8, "bior1.5", 0, False)[0], float)
        mine = tr.wavelet_matrix(8, "bior1.5")
        for i in range(8):
            found = False
            for j in range(8):
                for shift in range(8):
                    ms = np.roll(mine[j], shift)
                    s = (ref[i] * ms).sum() / (ms * ms).sum()
                    if np.abs(ref[i] - s * ms).max() < 1e-9:
                        found = True
            assert found, f"reference row {i} not in our basis"

    def test_haar_orthonormal(self):
        for n in (2, 4, 8, 16, 32):
            f, i = tr.transform_pair(n, "haar")
            np.testing.assert_allclose(f @ f.T, np.eye(n), atol=1e-12)
            np.testing.assert_allclose(i, f.T, atol=1e-12)

    def test_dct_matches_scipy(self):
        from scipy.fft import dct

        np.testing.assert_allclose(
            tr.dct_matrix(8), dct(np.eye(8), norm="ortho").T, atol=1e-12
        )

    def test_kaiser(self):
        w = tr.kaiser_window(8, 2.0)
        assert w.shape == (8, 8)
        np.testing.assert_allclose(w, w.T)


class TestBM3D:
    def test_denoising_quality_synthetic(self, rng):
        xx, yy = np.meshgrid(np.arange(64), np.arange(64))
        x = 0.5 + 0.3 * np.sin(xx / 8.0) * np.cos(yy / 11.0)
        sigma = 0.1
        z = x + sigma * rng.standard_normal((64, 64))

        y = np.asarray(core.bm3d(jnp.asarray(z, jnp.float32), sigma))

        def psnr(a, b):
            return 10 * np.log10(1.0 / np.mean((a - b) ** 2))

        assert psnr(y, x) > psnr(z, x) + 9.0  # strong denoising
        assert psnr(y, x) > 31.0

    def test_ht_only_stage(self, rng):
        x = 0.5 * np.ones((48, 48))
        z = x + 0.08 * rng.standard_normal((48, 48))
        y = np.asarray(core.bm3d(jnp.asarray(z, jnp.float32), 0.08, stages="ht"))
        assert np.abs(y - 0.5).mean() < np.abs(z - 0.5).mean() / 3

    def test_determinism(self, rng):
        z = rng.random((48, 48)).astype(np.float32)
        a = np.asarray(core.bm3d(jnp.asarray(z), 0.1))
        b = np.asarray(core.bm3d(jnp.asarray(z), 0.1))
        np.testing.assert_array_equal(a, b)

    def test_batched_prior(self, rng):
        from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

        den = bm3d_prior.make_bm3d_denoiser(noise_var=0.01)
        v = jnp.asarray(rng.random((2, 48, 48)).astype(np.float32))
        out = den(v, 0)
        assert out.shape == v.shape
        single = den(v[0], 0)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-6)

    def test_chunked_vmap_batching_matches_per_image(self, rng):
        """The vmapped batch path (batch_chunk>1, the TPU default) gives
        the same output as the sequential per-image lax.map path,
        including a batch that is not a multiple of the chunk (padding
        must be dropped, not leak)."""
        from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

        v = jnp.asarray(rng.random((3, 48, 48)).astype(np.float32))
        den_seq = bm3d_prior.make_bm3d_denoiser(noise_var=0.01, batch_chunk=1)
        den_vec = bm3d_prior.make_bm3d_denoiser(noise_var=0.01, batch_chunk=2)
        np.testing.assert_allclose(np.asarray(den_vec(v, 0)),
                                   np.asarray(den_seq(v, 0)), atol=2e-6)

    def test_chunked_ladder_batching_matches_per_image(self, rng):
        from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

        v = jnp.asarray(rng.random((4, 48, 48)).astype(np.float32))
        sig = [0.12, 0.08]
        den_seq = bm3d_prior.make_bm3d_ladder_denoiser(sig, batch_chunk=1)
        den_vec = bm3d_prior.make_bm3d_ladder_denoiser(sig, batch_chunk=4)
        np.testing.assert_allclose(np.asarray(den_vec(v, 1)),
                                   np.asarray(den_seq(v, 1)), atol=2e-6)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
class TestOracleParity:
    """Direct agreement with the reference C binaries (bm3d_thr/wie.so)."""

    def test_against_c_binaries(self, rng, tmp_path_factory):
        # The reference package needs environment fixes to run here
        # (np.float removal, scipy.signal.gaussian move, find_library not
        # seeing wheel-bundled BLAS, missing pywt); patch a scratch copy
        # and run it in a subprocess where LD_LIBRARY_PATH can still take
        # effect (the dynamic linker reads it only at process start).
        import re
        import shutil
        import subprocess

        scratch = tmp_path_factory.getbasetemp() / "bm3d_oracle"
        if not (scratch / "bm3d307").is_dir():
            scratch.mkdir(parents=True, exist_ok=True)
            shutil.copytree(os.path.join(REF, "bm3d307"), scratch / "bm3d307")
            for py in (scratch / "bm3d307" / "bm3d").glob("*.py"):
                src = py.read_text()
                src = re.sub(r"np\.float\(", "float(", src)
                src = re.sub(r"np\.int\(", "int(", src)
                src = src.replace(
                    'if platform == "linux" and find_library("openblas") is None:',
                    "if False:",
                )
                src = src.replace(
                    "signal.gaussian(", "signal.windows.gaussian("
                )
                py.write_text(src)
            (scratch / "pywt.py").write_text(
                "import sys\n"
                "sys.path.insert(0, '/root/repo')\n"
                "from pnp_admm_cnc_mri_tpu.priors.bm3d.transforms import wavedec_vector\n"
                "def wavedec(data, wavelet, mode='periodization', level=None):\n"
                "    return wavedec_vector(data, wavelet, level)\n"
            )
            libdir = scratch / "libs"
            libdir.mkdir(exist_ok=True)
            cv = "/opt/venv/lib/python3.12/site-packages/opencv_python.libs"
            for name in os.listdir(cv):
                # openblas under the dlopened soname + its bundled deps
                # (libgfortran etc.) under their own names
                dst = libdir / ("libopenblas.so.0" if "openblas" in name
                                else name)
                if not dst.exists():
                    dst.symlink_to(os.path.join(cv, name))

        from pnp_admm_cnc_mri_tpu.data import images

        img = images.imread_gray(os.path.join(REF, "testsets/set1/05.png"))
        x = img.astype(np.float64)[:128, :128] / 255.0
        sigma = float(np.sqrt(0.03))
        z = x + sigma * rng.standard_normal(x.shape)
        np.save(scratch / "z.npy", z)

        driver = (
            "import sys, numpy as np\n"
            f"sys.path.insert(0, {str(scratch)!r})\n"
            "from bm3d307.bm3d import bm3d\n"
            f"z = np.load({str(scratch / 'z.npy')!r})\n"
            f"np.save({str(scratch / 'yo.npy')!r}, bm3d(z, {sigma!r}))\n"
        )
        env = dict(os.environ)
        env["LD_LIBRARY_PATH"] = ":".join(
            [
                str(scratch / "libs"),
                "/opt/venv/lib/python3.12/site-packages/opencv_python.libs",
                env.get("LD_LIBRARY_PATH", ""),
            ]
        )
        env.pop("JAX_PLATFORMS", None)
        proc = subprocess.run(
            [sys.executable, "-c", driver], env=env, capture_output=True, text=True,
            timeout=300,
        )
        if proc.returncode != 0:
            pytest.skip(f"C oracle failed to run: {proc.stderr[-400:]}")
        yo = np.load(scratch / "yo.npy")
        y = np.asarray(core.bm3d(jnp.asarray(z, jnp.float32), sigma))

        def psnr(a, b):
            return 10 * np.log10(1.0 / np.mean((np.asarray(a) - np.asarray(b)) ** 2))

        # quality within 0.3 dB of the C implementation, strong agreement
        assert psnr(y, x) > psnr(yo, x) - 0.3, (psnr(y, x), psnr(yo, x))
        assert psnr(y, yo) > 30.0, psnr(y, yo)


class TestMatmulDistances:
    """MXU banded-matmul SSD fields == the separable-convolve fields
    (accelerator fast path; round-2 throughput push)."""

    def test_equal_on_valid_candidates(self):
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.priors.bm3d import core

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((96, 96)).astype(np.float32))
        ref = core._ref_grid(96 - 8 + 1, 3)
        for search in (39, 25):  # np profile + lc profile (non-128-multiple)
            offs = core._offsets(search, 8)
            d1 = np.asarray(core._block_distances(img, ref, offs, 8))
            d2 = np.asarray(core._block_distances_matmul(img, ref, offs, 8))
            ok = d1 < 1e3  # non-poisoned candidates
            assert np.abs(d1 - d2)[ok].max() < 1e-5
            # poisoned candidates stay poisoned (way above any tau)
            if (~ok).any():
                assert d2[~ok].min() > 1e4

    def test_match_identical(self):
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.priors.bm3d import core

        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((64, 64)).astype(np.float32))
        ref = core._ref_grid(64 - 8 + 1, 3)
        offs = core._offsets(39, 8)
        pos1, c1 = core._match(img, ref, offs, 8, 16, 0.5)
        orig = core._block_distances
        core._block_distances = core._block_distances_matmul
        try:
            pos2, c2 = core._match(img, ref, offs, 8, 16, 0.5)
        finally:
            core._block_distances = orig
        # counts and the within-count (actually used) positions must agree;
        # the tail beyond `count` can reorder among poisoned-distance ties
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        p1, p2, cc = np.asarray(pos1), np.asarray(pos2), np.asarray(c1)
        for g in range(p1.shape[0]):
            np.testing.assert_array_equal(p1[g, : cc[g]], p2[g, : cc[g]])


class TestTreeStackFilter:
    """Shared-prefix Haar-tree stack filtering == the per-size einsum loop
    (accelerator fast path; the orthonormal Haar transform of the first
    2^j stack rows is a prefix of the butterfly tree over all K rows)."""

    @pytest.mark.parametrize("stage", ["ht", "wiener"])
    def test_stage_output_matches_matrix_path(self, stage):
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.priors.bm3d import core

        rng = np.random.default_rng(7)
        img = np.clip(rng.normal(0.5, 0.2, (96, 96)), 0, 1)
        noisy = jnp.asarray(img + 0.08 * rng.standard_normal((96, 96)),
                            jnp.float32)
        try:
            core._STACK_FILTER_TREE = False
            ht = core.ht_stage(noisy, 0.08)
            ref = np.asarray(ht if stage == "ht"
                             else core.wiener_stage(noisy, ht, 0.08))
            core._STACK_FILTER_TREE = True
            got = np.asarray(core.ht_stage(noisy, 0.08) if stage == "ht"
                             else core.wiener_stage(noisy, ht, 0.08))
        finally:
            core._STACK_FILTER_TREE = None
        assert np.abs(got - ref).max() < 1e-5

    def test_tree_filter_vs_matrix_unit(self):
        """Unit-level: (hat, wts) agree on valid rows for every stack size
        mix; rows >= count are don't-care in hat but zero in wts."""
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.priors.bm3d import core

        rng = np.random.default_rng(11)
        g, k, c = 64, 16, 64
        groups = jnp.asarray(rng.standard_normal((g, k, c)), jnp.float32)
        counts = jnp.asarray(rng.choice([1, 2, 4, 8, 16], size=(g,)),
                             jnp.int32)
        sigma, thr = 0.08, 3.0 * 0.08

        sizes, haar_f, haar_i = core._haar_bank(k)
        hat_m = jnp.zeros_like(groups)
        wts_m = jnp.zeros((g, k), groups.dtype)
        for s, hf, hi in zip(sizes, haar_f, haar_i):
            c3 = jnp.einsum("st,gtc->gsc", hf, groups[:, :s, :])
            keep = jnp.abs(c3) > thr
            c3 = jnp.where(keep, c3, 0.0)
            nnz = jnp.sum(keep, axis=(1, 2)).astype(groups.dtype)
            w_g = 1.0 / (sigma**2 * jnp.maximum(nnz, 1.0))
            blocks_s = jnp.pad(jnp.einsum("ts,gsc->gtc", hi, c3),
                               ((0, 0), (0, k - s), (0, 0)))
            sel = (counts == s)[:, None, None]
            hat_m = jnp.where(sel, blocks_s, hat_m)
            w_b = jnp.pad(jnp.broadcast_to(w_g[:, None], (g, s)),
                          ((0, 0), (0, k - s)))
            wts_m = jnp.where(sel[:, :, 0], w_b, wts_m)

        hat_t, wts_t = core._tree_filter_ht(groups, counts, thr, sigma, k)
        np.testing.assert_allclose(np.asarray(wts_t), np.asarray(wts_m),
                                   rtol=1e-5)
        cc = np.asarray(counts)
        ht_, hm_ = np.asarray(hat_t), np.asarray(hat_m)
        for i in range(g):
            np.testing.assert_allclose(ht_[i, : cc[i]], hm_[i, : cc[i]],
                                       atol=2e-5)


@pytest.mark.slow
class TestBlockmatchExportDecode:
    """Pin the C blockmatch-export decode against the live binaries.

    The round-5 A2 decomposition (PARITY.md) rests on the
    reverse-engineered export layout; this regression net re-runs the
    export on a seeded 64^2 scene and re-validates every decode rule, so
    layout drift (or a broken oracle environment) is caught by the slow
    suite rather than a silent mis-decode."""

    def test_layout_invariants(self, tmp_path_factory):
        import importlib.util
        import subprocess
        import sys as _sys

        sys_path = list(_sys.path)
        _sys.path.insert(0, "scripts")
        try:
            spec = importlib.util.spec_from_file_location(
                "bm_decompose_probe", "scripts/bm_decompose_probe.py")
            dp = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(dp)
        finally:
            _sys.path[:] = sys_path

        from oracle import ensure_bm3d_scratch

        scratch = str(tmp_path_factory.getbasetemp() / "bm_export")
        ensure_bm3d_scratch(scratch)
        rng = np.random.default_rng(0)
        n = 64
        z = np.clip(0.5 + 0.2 * rng.standard_normal((n, n)), 0, 1)
        np.save(os.path.join(scratch, "bz.npy"), z)
        driver = (
            "import sys, numpy as np\n"
            f"sys.path.insert(0, {scratch!r})\n"
            "from bm3d307.bm3d import bm3d, BM3DStages\n"
            f"z = np.load({os.path.join(scratch, 'bz.npy')!r})\n"
            "y, bm = bm3d(z, 0.1, stage_arg=BM3DStages.HARD_THRESHOLDING,\n"
            "             blockmatches=(True, False))\n"
            f"np.save({os.path.join(scratch, 'bm.npy')!r}, "
            "np.asarray(bm[0], np.int64))\n"
        )
        env = dict(os.environ)
        env["LD_LIBRARY_PATH"] = os.path.join(scratch, "libs")
        env.pop("PYTHONPATH", None)
        r = subprocess.run([_sys.executable, "-c", driver], env=env,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        bm = np.load(os.path.join(scratch, "bm.npy"))

        # header invariants
        assert bm[0] == bm.size
        n_ref = int(bm[1])
        W = n - 8 + 1
        grid = list(range(0, W, 3))
        if grid[-1] != W - 1:
            grid.append(W - 1)
        assert n_ref == len(grid) ** 2

        pos, counts = dp.decode_bm(bm, n, 8, 3, 16)
        refs = [(i, j) for i in grid for j in grid]
        for g, (ri, rj) in enumerate(refs):
            k = counts[g]
            assert k & (k - 1) == 0 and 1 <= k <= 16
            used = pos[g][:k]
            # ref block present (stored last -> decoded FIRST after the
            # best-first reversal)
            assert tuple(used[0]) == (ri, rj), (g, used[0], (ri, rj))
            # every candidate inside the CLAMP window (the round-5
            # finding that killed the shift-inside suspect)
            for r_, c_ in used:
                assert abs(int(r_) - ri) <= 19 and abs(int(c_) - rj) <= 19
            # padding repeats the ref
            assert all(tuple(p) == (ri, rj) for p in pos[g][k:])
