"""Decompose the residual BM3D per-call deviation: matching vs filtering.

Round-4 sealed A2 distributionally but left a ~3.7% per-call deviation
vs the C binaries with two *guessed* suspects (border windows, tie
order). Round 5 replaced guessing with the C's own exported block
matches (scripts/bm_match_probe.py decoded the layout:
``[size, n_ref, n_match, counts..., (row%39)*W + col ...]``, ref block
LAST per group, candidate windows CLAMPED at borders like ours — the
shift-inside suspect is dead on direct evidence; C ranks candidates by
2-D bior-transform-coefficient SSD, not pixel SSD: measured set overlap
0.885 pixel vs 0.962 bior on a natural 64^2 crop).

This probe completes the decomposition on a seeded natural image:

  A. ours(own matches)  vs C output  — the full per-call deviation
  B. ours(C's matches)  vs C output  — filtering-only deviation
  C. match-set overlap statistics    — the matching share

    python scripts/bm_decompose_probe.py --n 128 --sigma 0.08
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

SCRATCH = "/tmp/bm3d_scratch"


def c_run_with_matches(z: np.ndarray, sigma: float):
    """Two-stage C BM3D returning (y_final, y_ht, bm_ht, bm_wie)."""
    from oracle import ensure_bm3d_scratch

    ensure_bm3d_scratch(SCRATCH)
    np.save(os.path.join(SCRATCH, "dz.npy"), np.asarray(z, np.float64))
    driver = f"""
import sys, numpy as np
sys.path.insert(0, {SCRATCH!r})
from bm3d307.bm3d import bm3d, BM3DStages
z = np.load({os.path.join(SCRATCH, 'dz.npy')!r})
y_ht, bm1 = bm3d(z, {float(sigma)!r}, stage_arg=BM3DStages.HARD_THRESHOLDING,
                 blockmatches=(True, False))
y, bm2 = bm3d(z, {float(sigma)!r}, blockmatches=(True, True))
np.save({os.path.join(SCRATCH, 'd_yht.npy')!r}, np.asarray(y_ht, np.float64))
np.save({os.path.join(SCRATCH, 'd_y.npy')!r}, np.asarray(y, np.float64))
np.save({os.path.join(SCRATCH, 'd_bmht.npy')!r}, np.asarray(bm2[0], np.int64))
np.save({os.path.join(SCRATCH, 'd_bmwie.npy')!r}, np.asarray(bm2[1], np.int64))
print('C done')
"""
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = os.path.join(SCRATCH, "libs")
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, "-c", driver], env=env,
                       capture_output=True, text=True, timeout=1200)
    if r.returncode != 0:
        raise RuntimeError(f"C run failed:\n{r.stdout}\n{r.stderr}")
    g = lambda n: np.load(os.path.join(SCRATCH, n))
    return g("d_y.npy"), g("d_yht.npy"), g("d_bmht.npy"), g("d_bmwie.npy")


def decode_bm(bm: np.ndarray, n: int, bs: int, step: int, k_max: int,
              search_half: int = 19, reverse: bool = True):
    """Decode a C blockmatch export -> (pos (G, k_max, 2), counts (G,)).

    Layout (reverse-engineered, validated on the export's own headers):
    ``[total_ints, n_ref, n_slots, counts(n_ref), positions(n_ref * k_max)]``
    — the position block is a FIXED ``k_max`` slots per reference block
    (``n_slots = n_ref * k_max``; for the HT stage every count equals
    k_max so the packed and fixed layouts coincide). A group's USED
    candidates are its LAST ``count`` slots, stored in DESCENDING
    distance order with the reference block itself last (verified: the
    ref sits at slot k_max-1 in >99% of groups, the rest are ties).
    Position value = (abs_row % (2*search_half+1)) * (n-bs+1) + abs_col;
    the row de-mods uniquely inside the clamp window.

    ``reverse=True`` returns stacks best-first (ascending distance, ref
    first) — the classic BM3D stack order; ``False`` keeps the stored
    order. Rows beyond a group's count are padded with the ref position.
    """
    W = n - bs + 1
    n_ref = int(bm[1])
    counts = np.asarray(bm[3:3 + n_ref], np.int64)
    n_slots = int(bm[2])
    flat = np.asarray(bm[3 + n_ref:3 + n_ref + n_slots], np.int64)
    if n_slots == n_ref * k_max:
        slots = flat.reshape(n_ref, k_max)
        used = [slots[g, k_max - counts[g]:] for g in range(n_ref)]
    else:  # packed layout (every count == k_max)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        used = [flat[starts[g]:starts[g] + counts[g]] for g in range(n_ref)]
    grid = list(range(0, W, step))
    if grid[-1] != W - 1:
        grid.append(W - 1)
    refs = [(i, j) for i in grid for j in grid]
    assert len(refs) == n_ref, (len(refs), n_ref)
    mod = 2 * search_half + 1
    pos = np.zeros((n_ref, k_max, 2), np.int32)
    out_counts = np.zeros((n_ref,), np.int32)
    for g, (ri, rj) in enumerate(refs):
        rows = []
        for q in used[g]:
            rl, c = int(q) // W, int(q) % W
            best = None
            cand = rl
            while cand <= W - 1:
                if best is None or abs(cand - ri) < abs(best - ri):
                    best = cand
                cand += mod
            rows.append((best, c))
        if reverse:
            rows = rows[::-1]
        k = 1 << int(np.log2(len(rows)))  # power-of-2 stack rule
        rows = rows[:k]
        out_counts[g] = k
        for i in range(k_max):
            pos[g, i] = rows[i] if i < k else (ri, rj)
    return pos, out_counts


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--sigma", type=float, default=0.08)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image", default="05")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.data import images
    from pnp_admm_cnc_mri_tpu.priors.bm3d import core
    from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod

    imgs01, _, names = images.load_testset("/root/reference/testsets/set")
    img = imgs01[names.index(args.image)]
    c0 = (img.shape[0] - args.n) // 2
    img = img[c0:c0 + args.n, c0:c0 + args.n]
    rng = np.random.default_rng(args.seed)
    z = img + args.sigma * rng.standard_normal(img.shape)

    y_c, yht_c, bm_ht, bm_wie = c_run_with_matches(z, args.sigma)

    prof = core.BM3DProfile()
    pos_ht, cnt_ht = decode_bm(bm_ht, args.n, prof.bs_ht, prof.step_ht,
                               prof.max_3d_ht)
    pos_wie, cnt_wie = decode_bm(bm_wie, args.n, prof.bs_wie, prof.step_wie,
                                 prof.max_3d_wie)

    zj = jnp.asarray(z)
    sig = jnp.asarray(args.sigma)

    def agree(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = float(np.linalg.norm(a - b) / np.linalg.norm(b))
        psnr = float(20 * np.log10(1.0 / max(np.sqrt(np.mean((a - b) ** 2)),
                                             1e-12)))
        return {"agree_db": round(psnr, 2), "rel_pct": round(100 * rel, 2)}

    # A: our own two-stage
    yht_own = core.ht_stage(zj, sig, prof)
    y_own = core.wiener_stage(zj, yht_own, sig, prof)
    # B: our filtering on C's matches
    yht_cm = core.ht_stage(zj, sig, prof, ext_match=(pos_ht, cnt_ht))
    y_cm = core.wiener_stage(zj, yht_cm, sig, prof,
                             ext_match=(pos_wie, cnt_wie))
    # B': full C-match injection but measuring the HT stage alone too
    rows = {
        "n": args.n, "sigma": args.sigma, "seed": args.seed,
        "image": args.image,
        "ht_own_vs_C": agree(yht_own, yht_c),
        "ht_cmatch_vs_C": agree(yht_cm, yht_c),
        "final_own_vs_C": agree(y_own, y_c),
        "final_cmatch_vs_C": agree(y_cm, y_c),
        "wie_counts_hist": {int(k): int(v) for k, v in
                            zip(*np.unique(cnt_wie, return_counts=True))},
        "ht_counts_hist": {int(k): int(v) for k, v in
                           zip(*np.unique(cnt_ht, return_counts=True))},
    }
    print(json.dumps(rows, indent=1))
    if args.out:
        logger_mod.append_record(args.out, rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
