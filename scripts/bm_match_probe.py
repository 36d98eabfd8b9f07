"""Extract the C binaries' actual block matches and diff them vs ours.

Round-4 left two named suspects for the residual 3.7% per-call BM3D
deviation (PARITY.md): border-window handling (we poison out-of-image
candidates; classical BM3D shifts the search window inside) and top-k
tie ordering. Guessing is unnecessary: the C interface exports its
block-match data (``bm3d_ctypes.py:244-257`` — ``pre_block_matches=[1]``
appends an int array after the image planes). This probe

  1. runs the C HT stage with blockmatch export on a seeded image,
  2. decodes the bm array layout (validated on its own size header),
  3. runs OUR ``_match`` on the same image,
  4. reports: per-ref candidate-set equality, where mismatches live
     (border vs interior refs), and whether mismatched sets are
     explained by shifted-inside windows / tie order.

Final decoded layout (see scripts/bm_decompose_probe.py::decode_bm for
the canonical decoder + tests/test_bm3d_api.py::TestExtMatch for the
round-trip test): ``[total_ints, n_ref, n_slots, counts(n_ref),
positions(n_ref * k_max fixed slots)]``; a group's used candidates are
its LAST count slots, distance-DESCENDING with the reference block
last; position = (abs_row % 39) * (n - bs + 1) + abs_col (39 = the C's
circular row-buffer height, 2*19+1). Zero exported candidates fall
outside the CLAMP window — the C clamps at borders like we do.

    python scripts/bm_match_probe.py --n 64 --sigma 0.1
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

SCRATCH = "/tmp/bm3d_scratch"


def c_blockmatches(z: np.ndarray, sigma: float) -> np.ndarray:
    """Run the C HT stage with blockmatch export; return the raw int array."""
    from oracle import ensure_bm3d_scratch

    ensure_bm3d_scratch(SCRATCH)
    np.save(os.path.join(SCRATCH, "bz.npy"), np.asarray(z, np.float64))
    driver = f"""
import sys, numpy as np
sys.path.insert(0, {SCRATCH!r})
from bm3d307.bm3d import bm3d, BM3DStages
z = np.load({os.path.join(SCRATCH, 'bz.npy')!r})
y, bm = bm3d(z, {float(sigma)!r}, stage_arg=BM3DStages.HARD_THRESHOLDING,
             blockmatches=(True, False))
bm_ht = bm[0]  # (ht_blocks, zeros) tuple — __init__.py:327-328
np.save({os.path.join(SCRATCH, 'bm.npy')!r}, np.asarray(bm_ht, np.int64))
np.save({os.path.join(SCRATCH, 'by.npy')!r}, np.asarray(y, np.float64))
print('C done', bm_ht.shape)
"""
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = os.path.join(SCRATCH, "libs")
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, "-c", driver], env=env,
                       capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        raise RuntimeError(f"C run failed:\n{r.stdout}\n{r.stderr}")
    print(r.stdout.strip())
    return np.load(os.path.join(SCRATCH, "bm.npy"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--sigma", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    clean = np.clip(
        0.5 + 0.3 * np.sin(np.linspace(0, 6, args.n))[:, None]
        * np.cos(np.linspace(0, 4, args.n))[None, :], 0, 1)
    z = clean + args.sigma * rng.standard_normal((args.n, args.n))

    bm = c_blockmatches(z, args.sigma)
    print("bm array size:", bm.size, "header:", bm[:12].tolist())
    # decode: try the documented convention — element 0 is total int count
    np.save("/tmp/bm_raw.npy", bm)
    print("saved /tmp/bm_raw.npy; tail:", bm[-12:].tolist())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
