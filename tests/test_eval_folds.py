"""Fold-exclusion composite scoring protocol
(pnp_admm_cnc_mri_tpu/cli/eval_folds.py + the scripts/ wrapper).

The composite headlines are only as trustworthy as the composition rule:
every image must be scored by the fold model that EXCLUDED it, and any
hyper-parameter selection must see only held-IN images. Both rules are
pinned here against a stubbed CLI."""

import importlib.util
import json

import pytest


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "eval_folds_script", "scripts/eval_folds.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_manifest(tmp_path, folds):
    m = {"model": "drunet_gray",
         "folds": {fold: {"weights": str(tmp_path / f"drunet_{fold}.npz"),
                          "held_out": list(held)}
                   for fold, held in folds.items()}}
    p = tmp_path / "folds.json"
    p.write_text(json.dumps(m))
    return str(p)


FOLDS = {
    "fold1": ("01", "02", "03"),
    "fold2": ("04", "05", "06"),
    "fold3": ("07", "08", "09"),
    "fold4": ("10", "11", "12"),
    "fold5": ("13", "14", "15"),
}


def test_folds_partition_the_testset():
    ef = _load_script()
    ids = [i for held in ef.FOLDS.values() for i in held]
    assert sorted(ids) == [f"{k:02d}" for k in range(1, 16)]
    assert "05" in ef.FOLDS["fold2"]  # set1 comes from fold 2


def test_shipped_manifest_partitions():
    from pnp_admm_cnc_mri_tpu.cli import eval_folds as ef

    m = ef.load_manifest("model_zoo/folds.json")
    assert set(m["folds"]) == set(FOLDS)
    for fold, held in FOLDS.items():
        assert m["folds"][fold]["held_out"] == list(held)


def test_manifest_partition_validated(tmp_path):
    from pnp_admm_cnc_mri_tpu.cli import eval_folds as ef

    bad = dict(FOLDS)
    bad["fold5"] = ("13", "14", "05")  # 05 twice, 15 missing
    p = _write_manifest(tmp_path, bad)
    with pytest.raises(ValueError, match="partition"):
        ef.load_manifest(p)


def test_composite_uses_only_held_out_images(tmp_path, monkeypatch, capsys):
    """Script wrapper path: fold k scores every image at 30 + k, so a
    correct composition yields image i -> 30 + fold(i)."""
    ef = _load_script()

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


def test_select_nlm_uses_held_in_only(tmp_path, monkeypatch, capsys):
    """Validation selection must maximize the held-IN average, not the
    held-out one. The stub makes nlm=13 better on every held-out image
    but worse on held-in — a leaky selector would pick 13; the correct
    one picks 12 (and scores held-out at 12's values)."""
    from pnp_admm_cnc_mri_tpu.cli import eval_folds as ef
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    for fold in FOLDS:
        (tmp_path / f"drunet_{fold}.npz").write_bytes(b"x")
    mpath = _write_manifest(tmp_path, FOLDS)

    def fake_main(argv):
        w = [a for a in argv if str(tmp_path) in a][0]
        fold = "fold" + w.split("fold")[1][0]
        nlm = float(argv[argv.index("--nlm") + 1])
        held = set(FOLDS[fold])
        pim = {}
        for i in range(1, 16):
            img = f"{i:02d}"
            if nlm == 13.0:
                pim[img] = 35.0 if img in held else 29.0
            else:
                pim[img] = 31.0
        print(json.dumps({"psnr": sum(pim.values()) / 15,
                          "per_image_psnr": pim}))
        return 0

    monkeypatch.setattr(cli_main, "main", fake_main)
    out = tmp_path / "rows.jsonl"
    assert ef.main(["--manifest", mpath, "--select_nlm", "12,13",
                    "--out", str(out)]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(v == 12.0 for v in summary["selected_nlm"].values())
    assert all(v == 31.0 for v in summary["per_image"].values())
    assert "validation-selected" in summary["protocol"]
    # provenance: every row embeds its argv + held_in_avg
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert all("argv" in r for r in rows[:-1])
    assert all("held_in_avg" in r for r in rows[:-1])


def test_select_nlm_warns_on_grid_edge(tmp_path, monkeypatch, capsys):
    """A grid-edge validation winner emits a warning row (the optimum may
    lie outside the candidate list)."""
    from pnp_admm_cnc_mri_tpu.cli import eval_folds as ef
    from pnp_admm_cnc_mri_tpu.cli import main as cli_main

    for fold in FOLDS:
        (tmp_path / f"drunet_{fold}.npz").write_bytes(b"x")
    mpath = _write_manifest(tmp_path, FOLDS)

    def fake_main(argv):
        nlm = float(argv[argv.index("--nlm") + 1])
        pim = {f"{i:02d}": 30.0 + nlm for i in range(1, 16)}  # edge wins
        print(json.dumps({"psnr": 30.0 + nlm, "per_image_psnr": pim}))
        return 0

    monkeypatch.setattr(cli_main, "main", fake_main)
    out = tmp_path / "rows.jsonl"
    assert ef.main(["--manifest", mpath, "--select_nlm", "12,13,14",
                    "--out", str(out)]) == 0
    text = capsys.readouterr().out
    assert "grid edge" in text
    summary = json.loads(text.strip().splitlines()[-1])
    assert all(v == 14.0 for v in summary["selected_nlm"].values())
