"""Scenario-grid sweep runner: grid construction + CLI smoke."""

import json
import subprocess
import sys

import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.cli import sweep


class TestBuildGrid:
    def test_grid_shapes_and_labels(self, rng):
        imgs = rng.random((3, 16, 16))
        masks = {"a": np.ones((16, 16)), "b": np.zeros((16, 16))}
        noise = np.zeros((16, 16), np.complex128)
        ys, ms, idxs, labels = sweep.build_grid(imgs, masks, [1.0, 2.0], noise)
        assert ys.shape == (12, 16, 16) and ms.shape == (12, 16, 16)
        assert len(labels) == 12 and idxs.tolist()[:3] == [0, 1, 2]
        assert labels[0] == "img0_a_s1.0"

    def test_grid_observations_correct(self, rng):
        imgs = rng.random((2, 8, 8))
        mask = (rng.random((8, 8)) < 0.5).astype(float)
        noise = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
        ys, ms, idxs, _ = sweep.build_grid(imgs, {"m": mask}, [2.0], noise)
        want = np.fft.fft2(imgs[1]) * mask + 2.0 * noise
        np.testing.assert_allclose(ys[1], want.astype(np.complex64), rtol=1e-5)


@pytest.mark.slow
def test_sweep_cli_end_to_end():
    proc = subprocess.run(
        [
            sys.executable, "-m", "pnp_admm_cnc_mri_tpu.cli.sweep",
            "--cpu", "--algo", "admm_l1", "--testset", "set1",
            "--masks", "Q_Random30", "--iter_num", "10",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-400:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["scenarios"] >= 1 and summary["avg_psnr"] > 15


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["pnp_hqs_d", "red_d"])
def test_sweep_cli_hqs_red_end_to_end(algo):
    proc = subprocess.run(
        [
            sys.executable, "-m", "pnp_admm_cnc_mri_tpu.cli.sweep",
            "--cpu", "--algo", algo, "--model", "ffdnet_gray",
            "--testset", "set1", "--masks", "Q_Random30",
            "--iter_num", "5",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-400:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["scenarios"] >= 1 and summary["avg_psnr"] > 20


@pytest.mark.slow
def test_sweep_cli_fista_end_to_end():
    proc = subprocess.run(
        [
            sys.executable, "-m", "pnp_admm_cnc_mri_tpu.cli.sweep",
            "--cpu", "--algo", "pnp_fista_d", "--model", "ffdnet_gray",
            "--testset", "set1", "--masks", "Q_Random30",
            "--iter_num", "5",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-400:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["scenarios"] >= 1 and summary["avg_psnr"] > 20
