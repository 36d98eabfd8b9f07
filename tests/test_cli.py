"""CLI surface tests: flag plumbing for the tuned-settings path.

The golden end-to-end CLI values are covered by tests/test_golden.py; these
are fast checks that the new knobs (--tuned / --nlm / --model_sigma1) reach
the solver and denoiser builders.
"""

from __future__ import annotations

import dataclasses
import json

import pytest

from pnp_admm_cnc_mri_tpu import config as cfg_mod


def test_tuned_registry_keys_are_valid():
    cfg_keys = {f.name for f in dataclasses.fields(cfg_mod.ADMMConfig)}
    allowed = cfg_keys | {"nlm", "x8"}
    for table in (cfg_mod.TUNED_PNP_L1, cfg_mod.TUNED_PNP_CNC, cfg_mod.TUNED_BM3D):
        for name, tuned in table.items():
            extra = set(tuned) - allowed
            assert not extra, f"{name}: unknown tuned keys {extra}"


def test_tuned_models_cover_the_reference_model_names():
    # every reference model name has a tuned L1 entry (docs/USAGE.md table)
    assert set(cfg_mod.TUNED_PNP_L1) == set(cfg_mod.MODEL_NAMES)


@pytest.mark.parametrize("extra", [[], ["--tuned"], ["--nlm", "8"]])
def test_cli_admm_and_pnp_run(tmp_path, capsys, extra):
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    argv = [
        "pnp_l1_d", "--cpu", "--model", "dncnn_25", "--iter_num", "2",
        "--testset", "set1", "--no_save", "--results_dir", str(tmp_path),
    ] + extra
    assert cli_main.main(argv) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["psnr"] > 20.0  # trained zoo weights, 2 iterations


def test_cli_tuned_overridden_by_explicit_flag(tmp_path, capsys):
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    argv = [
        "pnp_l1_d", "--cpu", "--model", "ircnn_gray", "--tuned",
        "--iter_num", "2", "--testset", "set1", "--no_save",
        "--results_dir", str(tmp_path),
    ]
    assert cli_main.main(argv) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["iters"] == 2  # explicit flag beat tuned's 15


def test_cli_pnp_sr(tmp_path, capsys):
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    argv = [
        "pnp_sr", "--cpu", "--model", "dncnn_25", "--iter_num", "2",
        "--sf", "2", "--testset", "set1", "--no_save",
        "--results_dir", str(tmp_path),
    ]
    assert cli_main.main(argv) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["psnr"] > 24.0  # well above the ~22 dB zero-fill upsample


def test_cli_consensus_d(tmp_path, capsys):
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    argv = [
        "consensus_d", "--cpu", "--model", "dncnn_25", "--iter_num", "2",
        "--testset", "set1", "--no_save", "--results_dir", str(tmp_path),
    ]
    assert cli_main.main(argv) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["psnr"] > 22.0  # joint 3-mask reconstruction, 2 iterations


def test_cli_consensus_d_tuned_registry_keys():
    cfg_keys = {f.name for f in dataclasses.fields(cfg_mod.ADMMConfig)}
    allowed = cfg_keys | {"nlm", "x8"}
    for name, tuned in cfg_mod.TUNED_CONSENSUS_D.items():
        assert not set(tuned) - allowed, name


def test_cli_pnp_deblur(tmp_path, capsys):
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    argv = [
        "pnp_deblur", "--cpu", "--model", "dncnn_25", "--iter_num", "2",
        "--kernel", "aniso", "--testset", "set1", "--no_save",
        "--results_dir", str(tmp_path),
    ]
    assert cli_main.main(argv) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["psnr"] > 27.0  # well above the blurred observation (~24 dB)


def test_run_deblur_bm3d_prior(tmp_path):
    """--model bm3d routes through the ladder-driven BM3D prior."""
    import numpy as np

    from pnp_admm_cnc_mri_tpu.cli import experiments
    from pnp_admm_cnc_mri_tpu.data import images as images_mod

    import jax

    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    ts = tmp_path / "tiny"
    ts.mkdir()
    # smooth random scene, 64x64 (keeps the fixed-shape BM3D jit small)
    img = rng.random((8, 8))
    img = np.kron(img, np.ones((8, 8)))
    images_mod.imsave(img * 255.0, str(ts / "a.png"))

    out = experiments.run_deblur(
        model_name="bm3d", kernel="gauss", iter_num=2, testset="tiny",
        testsets_dir=str(tmp_path), results_dir=str(tmp_path / "res"),
        save_images=False,
    )
    # blocky scene + wide gaussian blur is hard at 2 ladder steps; the
    # blurred observation itself sits at ~20 dB
    assert out["psnr"] > 22.0


class TestCleanWeights:
    """--clean flag: leakage-free weight resolution + tuned-clean tables."""

    def test_resolve_clean_prefers_clean_file(self):
        from pnp_admm_cnc_mri_tpu.priors import denoiser as dn

        p = dn.resolve_weights("dncnn_25", clean=True)
        assert p is not None and p.endswith("dncnn_25_clean.npz"), p
        p2 = dn.resolve_weights("dncnn_25", clean=False)
        assert p2 is not None and p2.endswith("dncnn_25.npz"), p2

    def test_resolve_clean_fallback_warns(self, tmp_path):
        import warnings

        import numpy as np

        from pnp_admm_cnc_mri_tpu.priors import denoiser as dn

        np.savez(tmp_path / "foo.npz", a=np.zeros(1))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            p = dn.resolve_weights("foo", clean=True, model_zoo=str(tmp_path))
        assert p.endswith("foo.npz")
        assert any("clean" in str(w.message) for w in rec)

    def test_clean_tuned_registry_has_all_families(self):
        from pnp_admm_cnc_mri_tpu import config as cfg

        for name in cfg.MODEL_NAMES:
            assert name in cfg.TUNED_PNP_L1_CLEAN, name
        for reg in (cfg.TUNED_SR, cfg.TUNED_DEBLUR, cfg.TUNED_SR_CLEAN,
                    cfg.TUNED_DEBLUR_CLEAN):
            for name in ("drunet_gray", "ffdnet_gray", "fdncnn_gray",
                         "ircnn_gray", "dncnn_25"):
                assert name in reg, (name, reg)
        # FISTA/HQS registries: all five families + the weight-free bm3d prox
        for reg in (cfg.TUNED_FISTA_D, cfg.TUNED_CONSENSUS_FISTA,
                    cfg.TUNED_HQS_D, cfg.TUNED_RED_D,
                    cfg.TUNED_CONSENSUS_HQS, cfg.TUNED_PGD_D,
                    cfg.TUNED_PGD_CNC):
            for name in ("drunet_gray", "ffdnet_gray", "fdncnn_gray",
                         "ircnn_gray", "dncnn_25", "bm3d"):
                assert name in reg, (name, reg)

    def test_clean_cli_end_to_end(self):
        """--clean --tuned dncnn_25 reproduces the swept clean number."""
        import contextlib
        import io
        import json

        from pnp_admm_cnc_mri_tpu.cli import main as cli_main

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cli_main.main(["pnp_l1_d", "--cpu", "--clean", "--tuned",
                           "--model", "dncnn_25", "--testset", "set1",
                           "--no_save", "--results_dir",
                           "/tmp/pnpadmm_test_results"])
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert abs(out["psnr"] - 29.684) < 0.05, out
        assert out["iters"] == 4


class TestEvalDeterminismAndProvenance:
    """VERDICT r3 #5: eval rows must be reproducible from their own record,
    and identical CPU evals must be bitwise-deterministic (promote/reject
    decisions this round were made on 0.08 dB deltas)."""

    def _run(self, capsys, argv):
        import json

        from pnp_admm_cnc_mri_tpu.cli import main as cli_main

        assert cli_main.main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    def test_identical_cpu_evals_are_bitwise_equal(self, tmp_path, capsys):
        argv = [
            "pnp_fista_d", "--cpu", "--model", "dncnn_25", "--tuned",
            "--iter_num", "3", "--testset", "set1", "--no_save",
            "--results_dir", str(tmp_path),
        ]
        a = self._run(capsys, argv)
        b = self._run(capsys, argv)
        # bitwise: the full-precision repr must match, not just rounded dB
        assert a["psnr"] == b["psnr"]
        assert a.get("ssim") == b.get("ssim")

    def test_sweep_rows_carry_full_argv(self, tmp_path):
        import json

        from pnp_admm_cnc_mri_tpu.cli import sweep as sweep_cli

        out = tmp_path / "rows.jsonl"
        argv = ["--algo", "admm_l1", "--cpu", "--iter_num", "2",
                "--testset", "set1", "--masks", "Q_Random30",
                "--out", str(out)]
        assert sweep_cli.main(argv) == 0
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert rows and all(r.get("argv") == argv for r in rows)


def test_bf16_pipeline_quality_parity(tmp_path, capsys):
    """--bf16 must be quality-neutral end-to-end (<= 0.1 dB on set1) —
    the parity gate for the suite's pnp_dncnn17_b64_bf16 throughput row
    (VERDICT r4 #6)."""
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    psnrs = {}
    for tag, extra in (("f32", []), ("bf16", ["--bf16"])):
        argv = [
            "pnp_l1_d", "--cpu", "--model", "dncnn_25", "--tuned",
            "--iter_num", "12", "--testset", "set1", "--no_save",
            "--results_dir", str(tmp_path),
        ] + extra
        assert cli_main.main(argv) == 0
        psnrs[tag] = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])["psnr"]
    assert abs(psnrs["f32"] - psnrs["bf16"]) <= 0.1, psnrs


def test_images_filter_matches_full_set_slot(tmp_path, capsys):
    """--images restricts the batch while preserving each image's exact
    full-set observation (same mask slot, same fixed noise)."""
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    argv = ["admm_l1", "--cpu", "--f64", "--iter_num", "5", "--no_save",
            "--results_dir", str(tmp_path), "--testset", "set"]
    assert cli_main.main(argv) == 0
    full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cli_main.main(argv + ["--images", "05,11"]) == 0
    part = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert part["images"] == 2
    for img in ("05", "11"):
        assert part["per_image_psnr"][img] == full["per_image_psnr"][img]
    with pytest.raises(ValueError, match="not in testset"):
        cli_main.main(argv + ["--images", "99"])
