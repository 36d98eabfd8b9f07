"""Fold-exclusion composite scoring protocol (scripts/eval_folds.py).

The 33.002/33.567 composites are only as trustworthy as the composition
rule: every image must be scored by the fold model that EXCLUDED it.
This pins the rule against a stubbed CLI."""

import importlib.util
import json
import sys


def _load_eval_folds():
    spec = importlib.util.spec_from_file_location(
        "eval_folds", "scripts/eval_folds.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_folds_partition_the_testset():
    ef = _load_eval_folds()
    ids = [i for held in ef.FOLDS.values() for i in held]
    assert sorted(ids) == [f"{k:02d}" for k in range(1, 16)]
    assert "05" in ef.FOLDS["fold2"]  # set1 comes from fold 2


def test_composite_uses_only_held_out_images(tmp_path, monkeypatch, capsys):
    ef = _load_eval_folds()

    # stub weights files + a stubbed CLI whose per-image PSNRs encode the
    # fold that produced them (fold k scores every image at 30 + k, so a
    # correct composition yields image i -> 30 + fold(i))
    for k in range(1, 6):
        (tmp_path / f"drunet_fold{k}.npz").write_bytes(b"x")

    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    def fake_main(argv):
        w = [a for a in argv if "drunet_fold" in a][0]
        k = int(w.split("fold")[1][0])
        pim = {f"{i:02d}": 30.0 + k for i in range(1, 16)}
        print(json.dumps({"psnr": 30.0 + k, "per_image_psnr": pim}))
        return 0

    monkeypatch.setattr(cli_main, "main", fake_main)
    out = tmp_path / "rows.jsonl"
    assert ef.main(["--zoo", str(tmp_path), "--suffix", "",
                    "--out", str(out)]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    fold_of = {i: k for k, (name, held) in enumerate(ef.FOLDS.items(), 1)
               for i in held}
    for img, v in summary["per_image"].items():
        assert v == 30.0 + fold_of[img], (img, v)
    assert summary["set1_fold_excluded"] == 32.0  # fold 2 owns 05
