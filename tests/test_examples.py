"""Smoke tests: the examples/ scripts keep running as APIs evolve.

Each example is invoked through its ``main(argv)`` with small sizes /
few iterations; these only assert successful end-to-end execution (the
quality claims are covered by the golden and oracle suites).
"""

from __future__ import annotations

import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.abspath(os.path.join(EXAMPLES_DIR, "..")))


def _run(module_name, argv):
    import importlib

    mod = importlib.import_module(f"examples.{module_name}")
    assert mod.main(argv) in (None, 0)


def test_mri_reconstruction_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # example writes its output PNG to cwd
    _run("mri_reconstruction", ["--cpu", "--iters", "2", "--model", "dncnn_25"])


def test_super_resolution_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run("super_resolution", ["--cpu", "--iters", "2", "--model", "dncnn_25"])


@pytest.mark.parametrize("name,argv", [
    ("bm3d_grayscale", ["--size", "64", "--noise", "g1"]),
    ("bm3d_deblurring", ["--size", "64"]),
    ("bm3d_rgb", ["--size", "64"]),
    ("bm3d_multichannel", ["--size", "64"]),
])
def test_bm3d_examples(name, argv, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run(name, argv)
