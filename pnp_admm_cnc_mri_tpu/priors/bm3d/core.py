"""TPU-native BM3D: block-matching + collaborative 3-D filtering in pure JAX.

Re-design of the reference's native C libraries (``bm3d_thr.so`` /
``bm3d_wie.so``, interface ``bm3d307/bm3d/bm3d_py.h:4-16``) as fixed-shape,
jit-compilable tensor ops:

- All 8x8 blocks are 2-D transformed ONCE as a batched 64x64 matmul (MXU).
- Block matching is offset-parallel: for every search offset the SSD field
  is a shifted squared difference box-filtered with a separable 8x8 ones
  kernel, evaluated at the stride-3 reference grid; ``top_k`` picks the
  best K candidates (fixed K; invalid border offsets are poisoned with a
  large pad value).
- The matched-count rule of the C code (largest power of two <= number of
  candidates within tau_match, reference ``profiles.py:49,66``) is kept by
  evaluating the five fixed stack sizes {1,2,4,8,16(,32)} and selecting
  per group — static shapes, no data-dependent control flow.
- Hard-threshold / Wiener shrinkage and the inverse 3-D transform are
  batched einsums; aggregation is one scatter-add of Kaiser-weighted
  patches.

Parameters follow the reference profile 'np' (``profiles.py:44-67``) with
the white-noise auto-parameters lambda=3.0, mu^2=0.4 (reference
``__init__.py:868-869``; golden-tested in
``bm3d307/tests/psd_resizing_and_parameters.py``).

Known deviations from the C binaries (documented, PSNR-level impact;
round-5 decomposition against the C's own exported block matches,
``scripts/bm_match_probe.py`` / ``scripts/bm_decompose_probe.py``,
``results/bm_decompose_r5.jsonl``):
- Border windows are NOT a deviation: the C export shows zero candidates
  outside the clamp window — the binaries clamp like we do (the old
  "shifts inside" suspect is dead on direct evidence).
- The C ranks candidates by 2-D *transform-coefficient* SSD (bior1.5 is
  non-orthonormal, so this reweights frequencies vs our pixel SSD) with
  an nf=32 FFT-domain approximation; measured set overlap vs C: 0.885
  (our pixel metric) / 0.962 (exact bior metric). Feeding C's exact
  matches bounds matching's share of the HT deviation at ~0.8pp of
  1.96%; the remaining 1.15% (HT) / 0.77%% (Wiener) is filter-internal
  and precision-independent (f32==f64 to 2 decimals).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.priors.bm3d import transforms as tr


@dataclasses.dataclass(frozen=True)
class BM3DProfile:
    """Profile 'np' constants (reference ``bm3d307/bm3d/profiles.py:16-68``)."""

    # HT stage
    bs_ht: int = 8
    step_ht: int = 3
    max_3d_ht: int = 16
    search_ht: int = 39
    tau_match_ht: float = 3000.0
    lambda_thr3d: float = 3.0  # white-noise auto value (__init__.py:868)
    # Wiener stage
    bs_wie: int = 8
    step_wie: int = 3
    max_3d_wie: int = 32
    search_wie: int = 39
    tau_match_wie: float = 400.0
    mu2: float = 0.4  # white-noise auto value (__init__.py:869)
    lambda_2d: float = 2.0  # coarse-prefilter threshold (classic BM3D)
    tau_scale: float = 2.0  # d-distance scale calibrated against the C
    # binaries (output agreement 40-51 dB across sigma 0.05-0.17; the C
    # normalization of tau_match is not documented in the Python layer)
    # Transforms / aggregation
    transform_ht: str = "bior1.5"
    transform_wie: str = "dct"
    dec_level: int = 0  # HT wavelet column-roll (reference profiles.py:67;
    # a no-op for the hardcoded 8x8 bior1.5/dct/dst — see transforms.py)
    beta: float = 2.0  # Kaiser beta, HT-stage aggregation
    beta_wie: float = 2.0  # Kaiser beta, Wiener-stage aggregation
    # Refiltering (the reference's denoise_residual flag, profiles.py:36)
    denoise_residual: bool = False
    # Route scalar-sigma (white) calls through the exact-variance colored
    # core (block-overlap correlations modeled; ~2x cost). Enabled on the
    # named variant profiles: measured on natural 128^2 scenes vs fresh
    # C-binary runs it moves vn/vn_old/high/deb from -0.02..-0.53 dB to
    # -0.19..+0.20 (mean -0.03). 'np' keeps the fast white path (its
    # C-oracle output-agreement goldens pin that exact behavior).
    exact_white: bool = False


DEFAULT_PROFILE = BM3DProfile()

# Named profile variants (reference ``bm3d307/bm3d/profiles.py:136-220``).
# 'high' carries the reference's dec_level=1, which in the reference is a
# NO-OP at the profile's default 8x8 bior1.5 block transform (the
# hardcoded-matrix branch at ``__init__.py:493-505`` never sees
# dec_levels); it only alters pywt-generated wavelet matrices for custom
# block sizes, where it amounts to a cyclic column shift
# (``__init__.py:608`` — modeled in transforms.transform_pair).
PROFILES = {
    "np": DEFAULT_PROFILE,
    "refilter": BM3DProfile(denoise_residual=True),
    "vn": BM3DProfile(
        max_3d_ht=32, step_ht=4, bs_wie=11, step_wie=6,
        lambda_thr3d=2.8, tau_match_wie=3500.0, search_wie=39,
        exact_white=True,
    ),
    "lc": BM3DProfile(
        step_ht=6, search_ht=25, step_wie=5, max_3d_wie=16, search_wie=25,
    ),
    "vn_old": BM3DProfile(
        transform_ht="dct", bs_ht=12, step_ht=4, bs_wie=11, step_wie=6,
        lambda_thr3d=2.8, tau_match_wie=3500.0, tau_match_ht=5000.0,
        search_wie=39, exact_white=True,
    ),
    "high": BM3DProfile(
        step_ht=2, step_wie=2, lambda_thr3d=2.5, beta=2.5, beta_wie=1.5,
        dec_level=1, exact_white=True,
    ),
    "deb": BM3DProfile(
        transform_ht="dst", lambda_thr3d=2.9, bs_wie=8, step_wie=2,
        max_3d_wie=16, search_wie=39, tau_match_wie=800.0, beta_wie=0.0,
        exact_white=True,
    ),
}


def get_profile(name) -> BM3DProfile:
    """Select a named profile ('np', 'refilter', 'vn', 'lc', 'vn_old',
    'high', 'deb' — reference ``_select_profile``) or pass a
    ``BM3DProfile`` through."""
    if isinstance(name, BM3DProfile):
        return name
    try:
        return PROFILES[name]
    except KeyError:
        raise ValueError(
            f"unknown BM3D profile {name!r}; choose from {sorted(PROFILES)}"
        ) from None


# ---------------------------------------------------------------------------
# Static geometry helpers
# ---------------------------------------------------------------------------


def _ref_grid(n_pos: int, step: int) -> np.ndarray:
    """Stride-``step`` reference positions, always including the last
    (the C code forces the final row/column block)."""
    g = list(range(0, n_pos, step))
    if g[-1] != n_pos - 1:
        g.append(n_pos - 1)
    return np.asarray(g, dtype=np.int32)


def _offsets(search: int, bs: int) -> np.ndarray:
    """Candidate top-left offsets of the (search - bs + 1)^2 window."""
    n = search - bs + 1  # 32 for the default profile
    lo = -(n // 2 - 1)  # -15..16
    return np.arange(lo, lo + n, dtype=np.int32)


def _extract_blocks(img: jnp.ndarray, bs: int) -> jnp.ndarray:
    """All overlapping bs x bs blocks -> (nH, nW, bs*bs), row-major pixels."""
    h, w = img.shape
    nh, nw = h - bs + 1, w - bs + 1
    patches = []
    for di in range(bs):
        for dj in range(bs):
            patches.append(jax.lax.dynamic_slice(img, (di, dj), (nh, nw)))
    return jnp.stack(patches, axis=-1)


def _box_filter(x: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Separable bs x bs 'valid' box sum over the trailing two axes."""
    k1 = jnp.ones((bs,), x.dtype)
    x = jax.vmap(lambda r: jnp.convolve(r, k1, mode="valid"), in_axes=0)(x)
    x = jax.vmap(lambda c: jnp.convolve(c, k1, mode="valid"), in_axes=1, out_axes=1)(x)
    return x


def _block_distances(
    match_img: jnp.ndarray, ref_pos: np.ndarray, offs: np.ndarray, bs: int
) -> jnp.ndarray:
    """SSD between each reference block and every offset candidate.

    Returns (R, R, O*O) distances where R = len(ref_pos), O = len(offs).
    Border-invalid candidates get a huge distance (pad poisoning).
    """
    h, w = match_img.shape
    pad = int(max(-offs.min(), offs.max()))
    big = jnp.asarray(1e4, match_img.dtype)
    zp = jnp.pad(match_img, pad, constant_values=1e4)

    rr = jnp.asarray(ref_pos)
    n_off = offs.shape[0]
    offs_j = jnp.asarray(offs)

    def one_offset(o_flat):
        oi = offs_j[o_flat // n_off]
        oj = offs_j[o_flat % n_off]
        shifted = jax.lax.dynamic_slice(zp, (pad + oi, pad + oj), (h, w))
        d2 = (match_img - shifted) ** 2
        d2 = jnp.minimum(d2, big)  # keep pad poison finite
        field = _box_filter(d2, bs)  # (h-bs+1, w-bs+1)
        return field[rr][:, rr]  # (R, R)

    d = jax.lax.map(
        one_offset, np.arange(n_off * n_off, dtype=np.int32), batch_size=64
    )  # (O*O, R, R)
    return jnp.moveaxis(d, 0, -1)


def _block_distances_matmul(
    match_img: jnp.ndarray, ref_pos: np.ndarray, offs: np.ndarray, bs: int
) -> jnp.ndarray:
    """MXU formulation of :func:`_block_distances`.

    The bs x bs box sum of the shifted squared difference is two banded
    matmuls, ``A_r @ D_o @ A_c^T``, with A the (R, H) 0/1 matrices that
    sum ``bs`` consecutive rows/columns starting at each reference
    position — and only the R reference rows/cols are materialized, so
    the whole (O^2, R, R) distance volume costs two einsums on the
    systolic array instead of 2*O^2 separable VPU convolutions.
    Numerically identical to the convolve path up to f32 summation order
    (Precision.HIGHEST keeps the distances f32-exact for the top_k).
    """
    h, w = match_img.shape
    pad = int(max(-offs.min(), offs.max()))
    big = jnp.asarray(1e4, match_img.dtype)
    zp = jnp.pad(match_img, pad, constant_values=1e4)

    def band(n_img):
        a = np.zeros((len(ref_pos), n_img), np.float32)
        for i, r in enumerate(ref_pos):
            a[i, r : r + bs] = 1.0
        return jnp.asarray(a, match_img.dtype)

    a_r = band(h)  # (R, H)
    a_c = band(w)  # (R, W)
    n_off = offs.shape[0]
    offs_j = jnp.asarray(offs)

    def d2_one(o_flat):
        oi = offs_j[o_flat // n_off]
        oj = offs_j[o_flat % n_off]
        shifted = jax.lax.dynamic_slice(zp, (pad + oi, pad + oj), (h, w))
        return jnp.minimum((match_img - shifted) ** 2, big)

    def chunk_fields(o_flat_chunk):
        d2 = jax.vmap(d2_one)(o_flat_chunk)  # (C, H, W)
        t = jnp.einsum("rh,ohw->orw", a_r, d2,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("orw,cw->orc", t, a_c,
                          precision=jax.lax.Precision.HIGHEST)

    total = n_off * n_off
    chunk = 128
    n_pad = (-total) % chunk
    o_all = np.concatenate(
        [np.arange(total), np.zeros(n_pad)]
    ).astype(np.int32).reshape(-1, chunk)
    d = jax.lax.map(chunk_fields, o_all)  # (ceil(O^2/128), 128, R, R)
    d = d.reshape(-1, len(ref_pos), len(ref_pos))[:total]
    return jnp.moveaxis(d, 0, -1)


def _coeff_distances(
    coeffs: jnp.ndarray, ref_pos: np.ndarray, offs: np.ndarray
) -> jnp.ndarray:
    """SSD between (prefiltered) per-block coefficient vectors.

    ``coeffs``: (nh, nw, C) per-block features. Used for the coarse
    prefiltered d-distance the classic algorithm switches to at high noise
    (sigma > 40/255): block matching on hard-thresholded 2-D transform
    coefficients instead of raw pixels. Returns (R, R, O*O).
    """
    nh, nw, c = coeffs.shape
    n_off = offs.shape[0]
    offs_j = jnp.asarray(offs)
    rr = jnp.asarray(ref_pos)
    r = rr.shape[0]
    flat = coeffs.reshape(-1, c)
    ref_feats = coeffs[rr][:, rr]  # (R, R, C)

    def one_offset(o_flat):
        oi = offs_j[o_flat // n_off]
        oj = offs_j[o_flat % n_off]
        pi = rr[:, None] + oi
        pj = rr[None, :] + oj
        valid = (pi >= 0) & (pi < nh) & (pj >= 0) & (pj < nw)
        pic = jnp.clip(pi, 0, nh - 1)
        pjc = jnp.clip(pj, 0, nw - 1)
        cand = flat[(pic * nw + pjc).reshape(-1)].reshape(r, r, c)
        d = jnp.sum((ref_feats - cand) ** 2, axis=-1)
        return jnp.where(valid, d, 1e10)

    # The map batch size bounds the materialized gather block
    # (bs, R, R, C): at 512^2 a fixed bs=64 holds 473 MB live and the
    # whole prefilter path went superlinear (the round-4 "area-scaling
    # cliff", 68 -> 498 ms full-call for 4x pixels); capping the block
    # at ~64 MB restores linear scaling (ht_stage 434 -> 204 ms at
    # 512^2, bs sweep in results/bm3d_cliff_r5.jsonl). Identical math —
    # batching a map changes no per-element arithmetic.
    block_bytes = r * r * c * 4
    bs = int(np.clip(64 * 2**20 // max(block_bytes, 1), 4, 64))
    d = jax.lax.map(
        one_offset, np.arange(n_off * n_off, dtype=np.int32), batch_size=bs
    )
    return jnp.moveaxis(d, 0, -1)


def _coeff_distances_shift(
    coeffs: jnp.ndarray, ref_pos: np.ndarray, offs: np.ndarray
) -> jnp.ndarray:
    """Shifted-field formulation of :func:`_coeff_distances` (round 5;
    measured and REJECTED — kept as the record).

    The gather-based path is the BM3D area-scaling cliff (VERDICT r4
    #5): its per-candidate 64-channel feature gather goes superlinear at
    512^2 (measured 68 -> 498 ms full-call, 7.3x for 4x pixels,
    `results/bm3d_cliff_r5.jsonl`; a norms+einsum expansion measured
    WORSE — 207/765 ms — the take_along_axis selections are gathers
    too). This path has no gathers at all: for each offset, shift the
    whole (nh, nw, C) feature field with a dynamic_slice, square the
    difference, reduce over channels, and index the reference grid —
    the exact structure of `_block_distances`, with the channel
    reduction replacing the box filter. Same distances bit-for-bit up
    to f32 reduction order; traffic is 2*A*C per offset (linear in
    area). CPU keeps the gather loop so oracle pins are unchanged.
    """
    nh, nw, c = coeffs.shape
    n_off = offs.shape[0]
    rr = jnp.asarray(ref_pos)
    offs_j = jnp.asarray(offs)
    pad = int(max(-offs.min(), offs.max()))
    # poison the halo so out-of-image candidates rank last (their
    # squared difference saturates; matches the gather path's 1e10)
    zp = jnp.pad(coeffs, ((pad, pad), (pad, pad), (0, 0)),
                 constant_values=1e3)

    def one_offset(o_flat):
        oi = offs_j[o_flat // n_off]
        oj = offs_j[o_flat % n_off]
        shifted = jax.lax.dynamic_slice(zp, (pad + oi, pad + oj, 0),
                                        (nh, nw, c))
        d2 = jnp.minimum((coeffs - shifted) ** 2, 1e8)
        field = jnp.sum(d2, axis=-1)  # (nh, nw)
        return field[rr][:, rr]

    d = jax.lax.map(
        one_offset, np.arange(n_off * n_off, dtype=np.int32), batch_size=32
    )  # (O*O, R, R)
    return jnp.moveaxis(d, 0, -1)


def _match(
    match_img: jnp.ndarray,
    ref_pos: np.ndarray,
    offs: np.ndarray,
    bs: int,
    k_max: int,
    tau: float,
    match_coeffs: Optional[jnp.ndarray] = None,
):
    """Block matching: returns (positions (G, K, 2) int32, counts (G,)).

    ``counts`` is the largest power of two <= #candidates with distance
    below ``tau`` (C-code group-size rule), clipped to [1, k_max]. With
    ``match_coeffs``, distances use the prefiltered coefficient vectors.
    """
    if match_coeffs is not None:
        # all backends: the gather path with the adaptive map batch (the
        # round-5 cliff fix). Two dense reformulations measured WORSE on
        # TPU (shifted-field 193/783 ms, norms+einsum 207/765 ms vs
        # gather 68/204 at 256^2/512^2) — see _coeff_distances_shift.
        d = _coeff_distances(match_coeffs, ref_pos, offs)  # (R, R, O^2)
    elif jax.default_backend() == "cpu":
        d = _block_distances(match_img, ref_pos, offs, bs)  # (R, R, O^2)
    else:
        # accelerators: SSD box sums as banded matmuls on the MXU
        d = _block_distances_matmul(match_img, ref_pos, offs, bs)
    r = d.shape[0]
    d = d.reshape(r * r, -1)
    if jax.default_backend() == "cpu":
        neg_d, idx = jax.lax.top_k(-d, k_max)  # (G, K)
    else:
        # TPU-native approximate top-k (recall 0.99): measured to select
        # the identical candidate set on the bench scenes (bit-equal
        # pipeline output) at ~half the top_k cost; CPU keeps the exact
        # kernel so oracle/golden tests are unchanged
        neg_d, idx = jax.lax.approx_max_k(-d, k_max, recall_target=0.99)
    dk = -neg_d

    counts = jnp.sum(dk <= tau, axis=-1)  # in [0 .. K]
    counts = jnp.maximum(counts, 1)
    pow2 = jnp.floor(jnp.log2(counts.astype(jnp.float32)))
    counts = (2 ** pow2).astype(jnp.int32)

    n_off = offs.shape[0]
    oi = jnp.asarray(offs)[idx // n_off]  # (G, K)
    oj = jnp.asarray(offs)[idx % n_off]
    ri = jnp.repeat(jnp.asarray(ref_pos), r)[:, None]
    rj = jnp.tile(jnp.asarray(ref_pos), r)[:, None]
    pi = ri + oi
    pj = rj + oj
    return jnp.stack([pi, pj], axis=-1), counts


def _group_coeffs(t2b: jnp.ndarray, pos: jnp.ndarray, nw: int) -> jnp.ndarray:
    """Gather 2-D transformed blocks at matched positions -> (G, K, bs*bs)."""
    flat = pos[..., 0] * nw + pos[..., 1]  # (G, K)
    t2b_flat = t2b.reshape(-1, t2b.shape[-1])
    return t2b_flat[flat]


def _haar_bank(k_max: int):
    fwd, inv = tr.stack_transforms(k_max, "haar")
    sizes = sorted(fwd)
    return sizes, [jnp.asarray(fwd[s], jnp.float32) for s in sizes], [
        jnp.asarray(inv[s], jnp.float32) for s in sizes
    ]


# ---------------------------------------------------------------------------
# Shared-prefix Haar tree stack filtering
# ---------------------------------------------------------------------------
#
# The per-size einsum loop evaluates every stack size s in {1,2,4,..,K}
# as (s,s) matmuls over all G groups — sum_s s^2 = 341 MACs/coefficient
# at K=16, at contraction dims (<=16) the MXU pads to full tiles. But the
# orthonormal Haar transform is dyadic: the transform of the first
# 2^j rows is a PREFIX of the butterfly tree over all K rows, so ONE
# elementwise tree (K-1 butterflies) yields every size's coefficients at
# once, and one select-guided inverse tree reconstructs each group at
# its own matched size. Same math (Haar values identical up to row
# order/sign, both irrelevant to |c|-thresholding, Wiener c^2 shrinkage
# and the orthonormal inverse); only float summation order differs.
# Auto-selected on accelerators; CPU keeps the matrix loop so the
# C-oracle/golden suites are bit-unchanged (same policy as approx_max_k).

_STACK_FILTER_TREE: Optional[bool] = None  # None = auto (tree off-CPU)


def _use_tree_filter(k_max: int = 16) -> bool:
    if k_max & (k_max - 1):  # tree needs a power-of-2 stack width
        return False
    if _STACK_FILTER_TREE is not None:
        return _STACK_FILTER_TREE
    return jax.default_backend() != "cpu"


def _haar_tree_fwd(groups: jnp.ndarray):
    """Butterfly cascade over the stack axis of (G, K, C), K a power of 2.

    Returns (scal, det): ``scal[l]`` (G, K/2^l, C) level-l scaling
    coefficients (``scal[0]`` is the input), ``det[l]`` the level-l
    details (``det[0]`` is None). Entry i of level l is computed from
    input rows [i*2^l, (i+1)*2^l) — the prefix property that makes every
    stack size's transform a sub-tree.
    """
    r2i = np.asarray(1.0 / np.sqrt(2.0), groups.dtype)
    scal, det = [groups], [None]
    s = groups
    while s.shape[1] > 1:
        a, b = s[:, 0::2, :], s[:, 1::2, :]
        s = (a + b) * r2i
        det.append((a - b) * r2i)
        scal.append(s)
    return scal, det


def _interleave_rows(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    g, m, c = x.shape
    return jnp.stack([x, y], axis=2).reshape(g, 2 * m, c)


def _tree_select_nnz(per_level, scal_root, counts, k_max: int):
    """sum over the size-2^j coefficient set, selected per group by count.

    ``per_level[l]`` (G, K/2^l, C): per-coefficient summand at detail
    level l (l >= 1); ``scal_root[j]`` (G,) the root-scaling summand for
    candidate size 2^j. Returns (G,) selected sums.
    """
    n_lev = int(np.log2(k_max))
    out = 0.0
    for j in range(n_lev + 1):
        tot = scal_root[j]
        for l in range(1, j + 1):
            tot = tot + per_level[l][:, : 2 ** (j - l), :].sum(axis=(1, 2))
        out = jnp.where(counts == 2**j, tot, out)
    return out


def _tree_synth(hat_s, hat_d, counts, k_max: int) -> jnp.ndarray:
    """Inverse Haar tree with per-group root selection.

    ``hat_s[l]`` / ``hat_d[l]``: filtered scaling/detail nodes. Groups of
    size 2^j reconstruct from root ``hat_s[j][:, 0]``; rows >= count come
    out as don't-care values and are killed by the zero aggregation
    weights (exactly like the matrix path's zero padding).
    """
    r2i = np.asarray(1.0 / np.sqrt(2.0), hat_s[0].dtype)
    n_lev = int(np.log2(k_max))
    s = hat_s[n_lev]
    for l in range(n_lev, 0, -1):
        up = _interleave_rows((s + hat_d[l]) * r2i, (s - hat_d[l]) * r2i)
        s = jnp.where((counts >= 2**l)[:, None, None], up, hat_s[l - 1])
    return s


def _tree_filter_ht(groups, counts, thr, sigma, k_max: int):
    """Tree-form hard-threshold stack filter -> (hat, wts).

    Equivalent to the per-size einsum loop in ``ht_stage`` (same
    coefficient VALUES per the prefix property; thresholding and nnz are
    order/sign-invariant)."""
    scal, det = _haar_tree_fwd(groups)
    keep_s = [jnp.abs(x) > thr for x in scal]
    hat_s = [jnp.where(k, x, 0.0) for k, x in zip(keep_s, scal)]
    keep_d = [None] + [jnp.abs(x) > thr for x in det[1:]]
    hat_d = [None] + [jnp.where(k, x, 0.0) for k, x in zip(keep_d[1:], det[1:])]
    dt = groups.dtype
    nnz = _tree_select_nnz(
        [None] + [k.astype(dt) for k in keep_d[1:]],
        [keep_s[j][:, 0, :].astype(dt).sum(-1) for j in range(len(scal))],
        counts, k_max)
    w_g = 1.0 / (sigma**2 * jnp.maximum(nnz, 1.0))
    hat = _tree_synth(hat_s, hat_d, counts, k_max)
    row_valid = jnp.arange(k_max)[None, :] < counts[:, None]
    wts = jnp.where(row_valid, w_g[:, None], 0.0).astype(dt)
    return hat, wts


def _tree_filter_wiener(gz, gp, counts, sigma_w, k_max: int):
    """Tree-form Wiener stack filter -> (hat, wts); mirrors the per-size
    einsum loop in ``wiener_stage``."""
    scal_z, det_z = _haar_tree_fwd(gz)
    scal_p, det_p = _haar_tree_fwd(gp)
    s2 = sigma_w**2
    wien_s = [p**2 / (p**2 + s2) for p in scal_p]
    wien_d = [None] + [p**2 / (p**2 + s2) for p in det_p[1:]]
    hat_s = [z * w for z, w in zip(scal_z, wien_s)]
    hat_d = [None] + [z * w for z, w in zip(det_z[1:], wien_d[1:])]
    dt = gz.dtype
    wsum = _tree_select_nnz(
        [None] + [w**2 for w in wien_d[1:]],
        [(wien_s[j][:, 0, :] ** 2).sum(-1) for j in range(len(scal_z))],
        counts, k_max)
    w_g = 1.0 / (s2 * jnp.maximum(wsum, 1e-10))
    hat = _tree_synth(hat_s, hat_d, counts, k_max)
    row_valid = jnp.arange(k_max)[None, :] < counts[:, None]
    wts = jnp.where(row_valid, w_g[:, None], 0.0).astype(dt)
    return hat, wts


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------


def _aggregate(
    img_shape, hat_blocks, weights, pos, window
) -> jnp.ndarray:
    """Kaiser-weighted scatter-add aggregation: returns num/den image.

    hat_blocks: (G, K, bs*bs) spatial-domain filtered blocks
    weights:    (G, K) per-block aggregation weights (0 for unused slots)
    pos:        (G, K, 2) top-left positions

    TPU-shaped two-step formulation: a ROW scatter accumulates each
    matched block onto its top-left position (G*K rows of bs^2 — XLA
    lowers wide-row scatters far better than the naive per-pixel scatter
    of G*K*bs^2 scalars), then bs^2 static overlap-adds spread the
    accumulated canvas — dense dynamic-update-slice adds the compiler
    fuses. Identical math; only the float summation order differs.
    """
    h, w = img_shape
    g, k, bsq = hat_blocks.shape
    bs = int(np.sqrt(bsq))
    nh, nw = h - bs + 1, w - bs + 1
    win = jnp.asarray(window.reshape(-1), hat_blocks.dtype)

    flat_pos = (pos[..., 0] * nw + pos[..., 1]).reshape(-1)  # (G*K,)
    vals = (hat_blocks * win[None, None, :] * weights[..., None]).reshape(-1, bsq)

    # ONE fused scatter of (bsq+1)-wide rows (values ++ weight) instead of
    # separate value/weight scatters — measured +7% end-to-end on the PnP
    # pipeline (scatter-add is collision-serialized; halving the scatter
    # count matters more than the extra column)
    rows = jnp.concatenate([vals, weights.reshape(-1, 1)], axis=-1)
    acc_all = jnp.zeros((nh * nw, bsq + 1), hat_blocks.dtype).at[flat_pos].add(rows)
    acc = acc_all[:, :bsq].reshape(nh, nw, bsq)
    accw = acc_all[:, bsq].reshape(nh, nw)

    num = jnp.zeros((h, w), hat_blocks.dtype)
    den = jnp.zeros((h, w), hat_blocks.dtype)
    for di in range(bs):
        for dj in range(bs):
            c = di * bs + dj
            num = num.at[di:di + nh, dj:dj + nw].add(acc[:, :, c])
            den = den.at[di:di + nh, dj:dj + nw].add(accw * win[c])
    return num / jnp.maximum(den, 1e-10)


def ht_stage(
    z: jnp.ndarray,
    sigma,
    profile: BM3DProfile = DEFAULT_PROFILE,
    prefilter: Optional[bool] = None,
    ext_match: Optional[tuple] = None,
) -> jnp.ndarray:
    """Hard-thresholding (basic-estimate) stage.

    ``ext_match``: optional ``(pos (G, K, 2) int32, counts (G,) int32)``
    externally-supplied block matches (e.g. decoded from the C binaries'
    blockmatch export, scripts/bm_match_probe.py) replacing ``_match`` —
    the instrument that decomposes per-call deviation into matching vs
    filtering. Group ROW ORDER is preserved (the stack transform is
    order-sensitive); positions beyond a group's count should repeat the
    reference block."""
    p = profile
    h, w = z.shape
    bs = p.bs_ht
    nh, nw = h - bs + 1, w - bs + 1

    t2f, t2i = tr.transform_pair(bs, p.transform_ht, p.dec_level)
    k2f = jnp.asarray(np.kron(t2f, t2f), z.dtype)
    k2i = jnp.asarray(np.kron(t2i, t2i), z.dtype)

    blocks = _extract_blocks(z, bs)  # (nh, nw, 64)
    t2b = blocks @ k2f.T

    ref_i = _ref_grid(nh, p.step_ht)
    offs = _offsets(p.search_ht, bs)
    tau = p.tau_match_ht * p.tau_scale * (bs * bs) / (255.0**2)
    # Coarse prefiltering for high noise (classic BM3D: sigma > 40/255):
    # match on hard-thresholded 2-D transform coefficients. The decision is
    # static (trace-time); with a traced sigma pass ``prefilter`` explicitly.
    if prefilter is None:
        try:
            prefilter = float(np.asarray(sigma)) > 40.0 / 255.0
        except (TypeError, jax.errors.TracerArrayConversionError):
            prefilter = False
    match_coeffs = None
    if prefilter:
        match_coeffs = jnp.where(jnp.abs(t2b) > p.lambda_2d * sigma, t2b, 0.0)
    if ext_match is not None:
        pos, counts = (jnp.asarray(ext_match[0], jnp.int32),
                       jnp.asarray(ext_match[1], jnp.int32))
    else:
        pos, counts = _match(z, ref_i, offs, bs, p.max_3d_ht, tau,
                             match_coeffs)

    groups = _group_coeffs(t2b, pos, nw)  # (G, K, 64)
    thr = p.lambda_thr3d * sigma

    if _use_tree_filter(p.max_3d_ht):
        hat, wts = _tree_filter_ht(groups, counts, thr, sigma, p.max_3d_ht)
    else:
        sizes, haar_f, haar_i = _haar_bank(p.max_3d_ht)
        g = groups.shape[0]
        hat = jnp.zeros_like(groups)
        wts = jnp.zeros((g, p.max_3d_ht), groups.dtype)
        for s, hf, hi in zip(sizes, haar_f, haar_i):
            c3 = jnp.einsum("st,gtc->gsc", hf, groups[:, :s, :])
            keep = jnp.abs(c3) > thr
            c3 = jnp.where(keep, c3, 0.0)
            nnz = jnp.sum(keep, axis=(1, 2)).astype(groups.dtype)
            w_g = 1.0 / (sigma**2 * jnp.maximum(nnz, 1.0))
            blocks_s = jnp.einsum("ts,gsc->gtc", hi, c3)  # (G, s, 64)
            pad_k = p.max_3d_ht - s
            blocks_s = jnp.pad(blocks_s, ((0, 0), (0, pad_k), (0, 0)))
            sel = (counts == s)[:, None, None]
            hat = jnp.where(sel, blocks_s, hat)
            w_b = jnp.pad(
                jnp.broadcast_to(w_g[:, None], (g, s)), ((0, 0), (0, pad_k))
            )
            wts = jnp.where(sel[:, :, 0], w_b, wts)

    hat_spatial = hat @ k2i.T
    window = tr.kaiser_window(bs, p.beta)
    return _aggregate((h, w), hat_spatial, wts, pos, window)


def wiener_stage(
    z: jnp.ndarray,
    pilot: jnp.ndarray,
    sigma,
    profile: BM3DProfile = DEFAULT_PROFILE,
    ext_match: Optional[tuple] = None,
) -> jnp.ndarray:
    """Wiener (final-estimate) stage using the HT output as pilot.

    ``ext_match`` as in :func:`ht_stage`."""
    p = profile
    h, w = z.shape
    bs = p.bs_wie
    nh, nw = h - bs + 1, w - bs + 1

    t2f, t2i = tr.transform_pair(bs, p.transform_wie)
    k2f = jnp.asarray(np.kron(t2f, t2f), z.dtype)
    k2i = jnp.asarray(np.kron(t2i, t2i), z.dtype)

    t2b_z = _extract_blocks(z, bs) @ k2f.T
    t2b_p = _extract_blocks(pilot, bs) @ k2f.T

    ref_i = _ref_grid(nh, p.step_wie)
    offs = _offsets(p.search_wie, bs)
    tau = p.tau_match_wie * p.tau_scale * (bs * bs) / (255.0**2)
    if ext_match is not None:
        pos, counts = (jnp.asarray(ext_match[0], jnp.int32),
                       jnp.asarray(ext_match[1], jnp.int32))
    else:
        pos, counts = _match(pilot, ref_i, offs, bs, p.max_3d_wie, tau)

    gz = _group_coeffs(t2b_z, pos, nw)
    gp = _group_coeffs(t2b_p, pos, nw)

    # Full-PSD convention: the reference multiplies the PSD (variance) by
    # mu2 before the Wiener call (``__init__.py:293-299``), so
    # sigma_w^2 = mu2 * sigma^2. End-to-end PnP-ADMM-L1-BM3D calibration vs
    # a fresh reference run: 25.055 dB vs 25.156 dB reference (0.1 dB).
    # (The C scalar-sigma entry path behaves closer to sigma^2*sqrt(mu2);
    # we standardize on the full-PSD pipeline convention.)
    sigma_w = sigma * jnp.sqrt(p.mu2)
    if _use_tree_filter(p.max_3d_wie):
        hat, wts = _tree_filter_wiener(gz, gp, counts, sigma_w, p.max_3d_wie)
    else:
        sizes, haar_f, haar_i = _haar_bank(p.max_3d_wie)
        g = gz.shape[0]
        hat = jnp.zeros_like(gz)
        wts = jnp.zeros((g, p.max_3d_wie), gz.dtype)
        for s, hf, hi in zip(sizes, haar_f, haar_i):
            cz = jnp.einsum("st,gtc->gsc", hf, gz[:, :s, :])
            cp = jnp.einsum("st,gtc->gsc", hf, gp[:, :s, :])
            wien = cp**2 / (cp**2 + sigma_w**2)
            cz = cz * wien
            w_g = 1.0 / (sigma_w**2 * jnp.maximum(jnp.sum(wien**2, axis=(1, 2)), 1e-10))
            blocks_s = jnp.einsum("ts,gsc->gtc", hi, cz)
            pad_k = p.max_3d_wie - s
            blocks_s = jnp.pad(blocks_s, ((0, 0), (0, pad_k), (0, 0)))
            sel = (counts == s)[:, None, None]
            hat = jnp.where(sel, blocks_s, hat)
            w_b = jnp.pad(jnp.broadcast_to(w_g[:, None], (g, s)), ((0, 0), (0, pad_k)))
            wts = jnp.where(sel[:, :, 0], w_b, wts)

    hat_spatial = hat @ k2i.T
    window = tr.kaiser_window(bs, p.beta_wie)
    return _aggregate((h, w), hat_spatial, wts, pos, window)


def _static_prefilter(sigma) -> Optional[bool]:
    try:
        return bool(float(np.asarray(sigma)) > 40.0 / 255.0)
    except Exception:
        return None


@functools.partial(jax.jit, static_argnames=("profile", "stages", "prefilter"))
def _bm3d_jit(z, sigma, profile, stages, prefilter):
    sigma = jnp.asarray(sigma, z.dtype)
    yb = ht_stage(z, sigma, profile, prefilter=bool(prefilter))
    if stages == "ht":
        return yb
    return wiener_stage(z, yb, sigma, profile)


def bm3d(
    z: jnp.ndarray,
    sigma,
    profile: BM3DProfile = DEFAULT_PROFILE,
    stages: str = "all",
    prefilter: Optional[bool] = None,
) -> jnp.ndarray:
    """Two-stage BM3D for white noise of std ``sigma`` ([0,1] scale).

    ``stages``: 'all' (HT then Wiener, the reference default), 'ht' only.
    ``prefilter`` selects coarse prefiltered block matching; by default it
    is decided from ``sigma`` at call time (> 40/255, the classic rule) —
    pass it explicitly when ``sigma`` is a traced value.
    Matches the reference entry ``bm3d(z, sigma_psd)`` with
    ``sigma = sqrt(psd / (H*W))`` for the white-noise PSDs the MRI
    pipelines use (reference ``utils/experiment_funcs.py:125``).
    """
    if prefilter is None:
        prefilter = _static_prefilter(sigma)
        if prefilter is None:
            prefilter = False
    return _bm3d_jit(z, sigma, profile, stages, bool(prefilter))


def bm3d_from_psd(z: jnp.ndarray, psd, profile=DEFAULT_PROFILE, prefilter=None):
    """Reference-compatible entry taking a (white) PSD array."""
    h, w = z.shape[-2:]
    sigma = np.sqrt(float(np.mean(np.asarray(psd))) / (h * w))
    return bm3d(z, sigma, profile, prefilter=prefilter)


# ---------------------------------------------------------------------------
# Colored-noise support: per-coefficient variances from a PSD
# ---------------------------------------------------------------------------


def psd_to_coeff_stds(psd: np.ndarray, kind: str, bs: int = 8,
                      dec_level: int = 0) -> np.ndarray:
    """Noise std of each 2-D transform coefficient under stationary noise.

    For noise with power spectral density P(k) (DC-at-corner, the
    ``var * H * W`` convention of ``data/noise.white_noise_psd``), the
    variance of transform coefficient (u, v) of any bs x bs block is

        var[u, v] = (1 / (H W)^2) * sum_k P(k) |FFT_{HxW}(b_uv)(k)|^2

    with b_uv the (u, v) basis patch zero-padded to the image size — the
    same quantity the reference C code derives from its PSD inputs. For a
    flat (white) PSD this reduces to sigma^2 * ||row_u||^2 ||row_v||^2,
    i.e. uniform sigma for orthonormal transforms. Returns stds (bs*bs,).
    """
    from pnp_admm_cnc_mri_tpu.priors.bm3d import transforms as _tr

    h, w = psd.shape[-2:]
    t2f, _ = _tr.transform_pair(bs, kind)
    tinv = np.linalg.inv(t2f)
    # basis patch for coefficient (u, v): outer(tinv[:, u], tinv[:, v])
    stds = np.zeros(bs * bs)
    psd = np.asarray(psd, np.float64)
    for u in range(bs):
        for v in range(bs):
            patch = np.outer(tinv[:, u], tinv[:, v])
            pad = np.zeros((h, w))
            pad[:bs, :bs] = patch
            resp = np.abs(np.fft.fft2(pad)) ** 2
            var = float((psd * resp).sum()) / (h * w) ** 2
            stds[u * bs + v] = np.sqrt(max(var, 0.0))
    return stds


def coeff_cov_field(
    psd: np.ndarray, kind: str, bs: int = 8, radius: int = 32,
    dec_level: int = 0,
) -> np.ndarray:
    """Cross-covariance of each 2-D transform coefficient between two
    blocks at spatial offset (dr, dc) under stationary noise with the
    given PSD (DC-at-corner, ``var * H * W`` convention).

    cov_c(d) = (1 / (HW)^2) * sum_k P(k) |B_c(k)|^2 e^{+j 2 pi k.d / N},
    computed as an inverse FFT and cropped (circularly) to
    |dr|, |dc| <= radius. Returns (bs*bs, 2r+1, 2r+1) float32, centered —
    ``out[c, r + dr, r + dc]``. At d = 0 this equals
    ``psd_to_coeff_stds(...)**2``; for a flat PSD the off-zero entries are
    the block-overlap correlations that classic BM3D ignores.

    This is the quantity behind the reference C binaries' exact
    transform-domain variance machinery for correlated noise (Makinen,
    Azzari, Foi 2020 — the algorithm the ``bm3d307`` package wraps).
    """
    from pnp_admm_cnc_mri_tpu.priors.bm3d import transforms as _tr

    h, w = psd.shape[-2:]
    t2f, _ = _tr.transform_pair(bs, kind)
    tinv = np.linalg.inv(t2f)
    psd = np.asarray(psd, np.float64)
    d = 2 * radius + 1
    idx_r = np.arange(-radius, radius + 1) % h
    idx_c = np.arange(-radius, radius + 1) % w
    out = np.zeros((bs * bs, d, d), np.float32)
    for u in range(bs):
        for v in range(bs):
            patch = np.outer(tinv[:, u], tinv[:, v])
            pad = np.zeros((h, w))
            pad[:bs, :bs] = patch
            resp = np.abs(np.fft.fft2(pad)) ** 2
            cov = np.real(np.fft.ifft2(psd * resp)) / (h * w)
            out[u * bs + v] = cov[np.ix_(idx_r, idx_c)]
    return out


def _exact_group_vars(
    pos_s: jnp.ndarray, covf: jnp.ndarray, hf: jnp.ndarray, radius: int,
    chunk: int = 512,
) -> jnp.ndarray:
    """Exact noise variance of every 3-D (stack-transformed) coefficient.

    pos_s: (G, s, 2) matched top-left positions; covf: (C, D, D) field
    from ``coeff_cov_field``; hf: (s, s) forward stack transform. Returns
    (G, s, C):  var[g, j, c] = sum_{i,i'} hf[j,i] hf[j,i'] cov_c(p_i-p_i').
    Group-chunked (``lax.map``) to bound the (C, chunk, s, s) gather.
    """
    g, s, _ = pos_s.shape
    n_chunks = -(-g // chunk)
    pad = n_chunks * chunk - g
    pos_p = jnp.pad(pos_s, ((0, pad), (0, 0), (0, 0)))

    def one(chunk_pos):
        dr = chunk_pos[:, :, None, 0] - chunk_pos[:, None, :, 0] + radius
        dc = chunk_pos[:, :, None, 1] - chunk_pos[:, None, :, 1] + radius
        covm = covf[:, dr, dc]  # (C, chunk, s, s)
        return jnp.einsum("ji,cgik,jk->gjc", hf, covm, hf)

    vars_ = jax.lax.map(one, pos_p.reshape(n_chunks, chunk, s, 2))
    return jnp.maximum(vars_.reshape(n_chunks * chunk, s, -1)[:g], 1e-12)


def ht_stage_colored(
    z: jnp.ndarray,
    coeff_stds: np.ndarray,
    match_sigma: float,
    profile: BM3DProfile = DEFAULT_PROFILE,
    cov_field: Optional[jnp.ndarray] = None,
    cov_radius: int = 32,
    match_weights: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """HT stage with per-coefficient thresholds (colored noise).

    ``coeff_stds``: (bs*bs,) stds from ``psd_to_coeff_stds`` for the HT
    transform; ``match_sigma`` the average std used for the prefilter
    decision and matching scale. Group weights use the sum of retained
    coefficient variances (reduces to sigma^2 * N_nz for white noise).

    With ``cov_field`` (from ``coeff_cov_field``), thresholds use the
    EXACT per-group 3-D coefficient variances derived from the matched
    blocks' relative positions — the reference C binaries' correlated-
    noise machinery — instead of the position-independent approximation.
    """
    p = profile
    h, w = z.shape
    bs = p.bs_ht
    nh, nw = h - bs + 1, w - bs + 1

    t2f, t2i = tr.transform_pair(bs, p.transform_ht, p.dec_level)
    k2f = jnp.asarray(np.kron(t2f, t2f), z.dtype)
    k2i = jnp.asarray(np.kron(t2i, t2i), z.dtype)

    blocks = _extract_blocks(z, bs)
    t2b = blocks @ k2f.T

    ref_i = _ref_grid(nh, p.step_ht)
    offs = _offsets(p.search_ht, bs)
    tau = p.tau_match_ht * p.tau_scale * (bs * bs) / (255.0**2)
    match_coeffs = None
    if match_sigma > 40.0 / 255.0:
        thr2d = jnp.asarray(p.lambda_2d * coeff_stds, z.dtype)
        match_coeffs = jnp.where(jnp.abs(t2b) > thr2d, t2b, 0.0)
    elif match_weights is not None:
        match_coeffs = t2b * jnp.asarray(
            np.sqrt(match_weights), z.dtype)[None, None, :]
    pos, counts = _match(z, ref_i, offs, bs, p.max_3d_ht, tau, match_coeffs)

    groups = _group_coeffs(t2b, pos, nw)
    stds_d = jnp.asarray(coeff_stds, z.dtype)  # (64,)
    thr = p.lambda_thr3d * stds_d  # broadcast over (G, K, 64)
    vars_d = stds_d**2

    sizes, haar_f, haar_i = _haar_bank(p.max_3d_ht)
    g = groups.shape[0]
    hat = jnp.zeros_like(groups)
    wts = jnp.zeros((g, p.max_3d_ht), groups.dtype)
    for s, hf, hi in zip(sizes, haar_f, haar_i):
        c3 = jnp.einsum("st,gtc->gsc", hf, groups[:, :s, :])
        if cov_field is not None:
            vars_s = _exact_group_vars(pos[:, :s], cov_field, hf, cov_radius)
            keep = jnp.abs(c3) > p.lambda_thr3d * jnp.sqrt(vars_s)
            # The joint DC (stack average, 2-D DC) is never thresholded:
            # for DC-heavy PSDs its exact noise std exceeds the block
            # mean itself and thresholding it wipes whole groups (drops
            # lowpass-PSD scenes ~5 dB below the C binaries; preserving
            # it puts all measured scenes at or above them).
            dc = (jnp.arange(s)[:, None] == 0) & (
                jnp.arange(c3.shape[-1])[None, :] == 0)
            keep = keep | dc[None]
            kept_var = jnp.sum(keep * vars_s, axis=(1, 2))
            # all-zeroed groups act as one retained mean-variance
            # coefficient (classic BM3D's N_nz=0 -> 1/sigma^2 rule); a
            # min-var floor explodes for PSDs with near-empty bands.
            floor = jnp.mean(vars_s, axis=(1, 2))
        else:
            keep = jnp.abs(c3) > thr
            kept_var = jnp.sum(keep * vars_d, axis=(1, 2))
            floor = jnp.mean(vars_d)
        c3 = jnp.where(keep, c3, 0.0)
        w_g = 1.0 / jnp.maximum(kept_var, floor + 1e-12)
        blocks_s = jnp.einsum("ts,gsc->gtc", hi, c3)
        blocks_s = jnp.pad(blocks_s, ((0, 0), (0, p.max_3d_ht - s), (0, 0)))
        sel = (counts == s)[:, None, None]
        hat = jnp.where(sel, blocks_s, hat)
        w_b = jnp.pad(jnp.broadcast_to(w_g[:, None], (g, s)), ((0, 0), (0, p.max_3d_ht - s)))
        wts = jnp.where(sel[:, :, 0], w_b, wts)

    window = tr.kaiser_window(bs, p.beta)
    return _aggregate((h, w), hat @ k2i.T, wts, pos, window)


def wiener_stage_colored(
    z: jnp.ndarray,
    pilot: jnp.ndarray,
    coeff_stds: np.ndarray,
    profile: BM3DProfile = DEFAULT_PROFILE,
    cov_field: Optional[jnp.ndarray] = None,
    cov_radius: int = 32,
    ext_match: Optional[tuple] = None,
) -> jnp.ndarray:
    """Wiener stage with per-coefficient noise variances (colored noise).

    ``cov_field``: optional exact-variance field (see ``ht_stage_colored``).
    """
    p = profile
    h, w = z.shape
    bs = p.bs_wie
    nh, nw = h - bs + 1, w - bs + 1

    t2f, t2i = tr.transform_pair(bs, p.transform_wie)
    k2f = jnp.asarray(np.kron(t2f, t2f), z.dtype)
    k2i = jnp.asarray(np.kron(t2i, t2i), z.dtype)

    t2b_z = _extract_blocks(z, bs) @ k2f.T
    t2b_p = _extract_blocks(pilot, bs) @ k2f.T

    ref_i = _ref_grid(nh, p.step_wie)
    offs = _offsets(p.search_wie, bs)
    tau = p.tau_match_wie * p.tau_scale * (bs * bs) / (255.0**2)
    if ext_match is not None:
        pos, counts = (jnp.asarray(ext_match[0], jnp.int32),
                       jnp.asarray(ext_match[1], jnp.int32))
    else:
        pos, counts = _match(pilot, ref_i, offs, bs, p.max_3d_wie, tau)

    gz = _group_coeffs(t2b_z, pos, nw)
    gp = _group_coeffs(t2b_p, pos, nw)
    vars_w = jnp.asarray(coeff_stds**2 * p.mu2, z.dtype)

    sizes, haar_f, haar_i = _haar_bank(p.max_3d_wie)
    g = gz.shape[0]
    hat = jnp.zeros_like(gz)
    wts = jnp.zeros((g, p.max_3d_wie), gz.dtype)
    for s, hf, hi in zip(sizes, haar_f, haar_i):
        cz = jnp.einsum("st,gtc->gsc", hf, gz[:, :s, :])
        cp = jnp.einsum("st,gtc->gsc", hf, gp[:, :s, :])
        if cov_field is not None:
            vars_s = p.mu2 * _exact_group_vars(pos[:, :s], cov_field, hf, cov_radius)
            wien = cp**2 / (cp**2 + vars_s)
            w_g = 1.0 / jnp.maximum(jnp.sum(wien**2 * vars_s, axis=(1, 2)), 1e-10)
        else:
            wien = cp**2 / (cp**2 + vars_w)
            w_g = 1.0 / jnp.maximum(jnp.sum(wien**2 * vars_w, axis=(1, 2)), 1e-10)
        cz = cz * wien
        blocks_s = jnp.einsum("ts,gsc->gtc", hi, cz)
        blocks_s = jnp.pad(blocks_s, ((0, 0), (0, p.max_3d_wie - s), (0, 0)))
        sel = (counts == s)[:, None, None]
        hat = jnp.where(sel, blocks_s, hat)
        w_b = jnp.pad(jnp.broadcast_to(w_g[:, None], (g, s)), ((0, 0), (0, p.max_3d_wie - s)))
        wts = jnp.where(sel[:, :, 0], w_b, wts)

    window = tr.kaiser_window(bs, p.beta_wie)
    return _aggregate((h, w), hat @ k2i.T, wts, pos, window)


def bm3d_colored(
    z: jnp.ndarray, psd: np.ndarray, profile: BM3DProfile = DEFAULT_PROFILE,
    exact: bool = False,
) -> jnp.ndarray:
    """Two-stage BM3D for stationary colored noise given its PSD.

    Extends the white-noise core with PSD-derived per-coefficient
    thresholds (the reference C binaries' colored-noise mode). The PSD
    uses the DC-at-corner ``var * H * W`` convention. ``exact=True``
    additionally uses the matched blocks' relative positions for exact
    3-D coefficient variances (the C binaries' correlated-noise
    machinery; costs ~2x).
    """
    psd = np.asarray(psd, np.float64)
    h, w = z.shape[-2:]
    match_sigma = float(np.sqrt(psd.mean() / (h * w)))
    stds_ht = psd_to_coeff_stds(psd, profile.transform_ht, profile.bs_ht,
                                dec_level=profile.dec_level)
    stds_wie = psd_to_coeff_stds(psd, profile.transform_wie, profile.bs_wie)
    cov_ht = cov_wie = None
    if exact:
        cov_ht = jnp.asarray(
            coeff_cov_field(psd, profile.transform_ht, profile.bs_ht,
                            dec_level=profile.dec_level))
        cov_wie = jnp.asarray(
            coeff_cov_field(psd, profile.transform_wie, profile.bs_wie))
    yb = ht_stage_colored(z, stds_ht, match_sigma, profile, cov_field=cov_ht)
    return wiener_stage_colored(z, yb, stds_wie, profile, cov_field=cov_wie)


def spectral_gate(z: jnp.ndarray, psd: np.ndarray, concentration: float = 16.0,
                  eps: float = 8.0, dc_guard_frac: float = 0.08):
    """Suppress narrowband noise with an empirical-Wiener gate in global FFT.

    For PSDs concentrated in a small set of frequency bins (oscillatory /
    patterned noise), 8x8-block thresholds cannot resolve the noise band
    but a global spectral gate can: on bins where the noise PSD exceeds
    ``concentration * mean(PSD)``, attenuate by the empirical Wiener factor
    S/(S + eps P) with S = max(|Z|^2/(H W) - P, 0) the single-realization
    signal-PSD estimate. Flat (white) PSDs have no such bins — the gate is
    an exact no-op there.

    Returns (gated image, updated PSD). NOTE: this stage has no reference
    counterpart; on narrowband test noise it outperforms the reference's C
    binaries (measured: 29.9 dB vs 29.4 at eps=8; a pure notch, eps=inf,
    reaches 30.7 at the cost of any signal in the hot bins), while leaving
    white-PSD inputs untouched and guarding the DC neighborhood so lowpass
    PSDs pass through to the block-domain colored core. ``eps`` scales the
    noise term in the Wiener factor — larger suppresses single-realization
    noise fluctuations harder.
    """
    h, w = z.shape[-2:]
    # float64 when enabled; silently f32 otherwise (avoids the noisy
    # truncation UserWarning an explicit float64 request emits)
    f_hi = jax.dtypes.canonicalize_dtype(jnp.float64)
    psd_j = jnp.asarray(psd, f_hi)
    hot = psd_j > concentration * jnp.mean(psd_j)
    # Never gate near DC: natural-image energy concentrates there, and a
    # lowpass noise PSD would otherwise make the gate destroy the signal's
    # own low band (BM3D's priors handle that regime instead).
    fy = np.minimum(np.arange(h), h - np.arange(h))
    fx = np.minimum(np.arange(w), w - np.arange(w))
    rr = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    guard = jnp.asarray(rr <= dc_guard_frac * min(h, w))
    hot = jnp.logical_and(hot, jnp.logical_not(guard))
    zf = jnp.fft.fft2(z.astype(f_hi), axes=(-2, -1))
    # In the var*H*W PSD convention, E|FFT(noise)(k)|^2 = P(k) directly, so
    # the single-realization signal-power estimate is |Z|^2 - P (no H*W
    # normalization — that would underestimate signal by 4-5 orders of
    # magnitude and degenerate the Wiener factor into a hard notch).
    s_emp = jnp.maximum(jnp.abs(zf) ** 2 - psd_j, 0.0)
    att = jnp.where(hot, s_emp / (s_emp + eps * psd_j + 1e-12), 1.0)
    zg = jnp.real(jnp.fft.ifft2(zf * att, axes=(-2, -1))).astype(z.dtype)
    psd_new = np.asarray(psd) * np.asarray(att if att.ndim == 2 else att[0]) ** 2
    return zg, psd_new


def adaptive_pilot_lambda(
    z, psd: np.ndarray, hot_conc: float = 8.0, dc_guard_frac: float = 0.08,
    hot_energy_thr: float = 0.5, sparsity_thr: float = 0.45,
    hard_lambda: float = 8.0,
) -> Optional[float]:
    """Scene-adaptive HT-pilot threshold for narrowband noise.

    On patch-sparse scenes (synthetic patterns/graphics) under NARROWBAND
    noise, the estimated soft pilot leaves a correlated in-band residual
    that self-confirms through the Wiener cp^2 term; a hard pilot
    (lambda=8) removes it and is worth 1.5-15 dB there, but over-smooths
    natural images. Decision statistics (host-side, from the noisy image
    and the PSD):

    - narrowband: the PSD's away-from-DC hot bins (> ``hot_conc`` x mean,
      outside the ``dc_guard_frac`` DC disk like ``spectral_gate``) carry
      more than ``hot_energy_thr`` of total noise energy. Measured at
      conc=8: g2 0.73, g3 0.98, g2w 0.60, g3w 0.78; white/lowpass
      families trigger nothing. With the adaptive decision the full
      9-family matrix lands at g1 +0.51, g1w +0.59, g2 +1.28, g2w +1.02,
      g3 +1.26, g3w -0.16 dB vs fresh C-binary oracles (previously
      g2 -2.77, g2w -2.76, g3 -13.9, g3w -6.7) while gw/g4/g4w keep the
      estimated-lambda path (-0.17/-0.01/-0.20).
    - patch-sparse scene: the top 0.1% non-hot spectrum bins of z carry
      more than ``sparsity_thr`` of the out-of-band energy. Measured:
      synthetic sinusoid/checker/gradient 0.57-0.76, natural images
      0.17-0.32 (4 images x g2/g3/g3w) — a wide margin around 0.45.

    Returns ``hard_lambda`` when both trigger, else None (keep the
    estimated lambda).
    """
    psd = np.asarray(psd, np.float64)
    h, w = psd.shape[-2:]
    fy = np.minimum(np.arange(h), h - np.arange(h))
    fx = np.minimum(np.arange(w), w - np.arange(w))
    rr = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    hot = (psd > hot_conc * psd.mean()) & (rr > dc_guard_frac * min(h, w))
    if not hot.any() or psd[hot].sum() / psd.sum() <= hot_energy_thr:
        return None
    zf = np.abs(np.fft.fft2(np.asarray(z, np.float64))) ** 2
    sel = ~hot & (rr > 2)
    e = np.sort(zf[sel])[::-1]
    topk = max(1, int(0.001 * e.size))
    if e[:topk].sum() / max(e.sum(), 1e-30) <= sparsity_thr:
        return None
    return hard_lambda


def bm3d_colored_auto(
    z: jnp.ndarray, psd: np.ndarray, profile: BM3DProfile = DEFAULT_PROFILE,
    gate_concentration: Optional[float] = None, exact: bool = True,
    auto_params: bool = True, pilot_lambda: Optional[float] = None,
    adaptive_pilot: bool = True,
) -> jnp.ndarray:
    """Colored-noise BM3D: estimated parameters + exact variances.

    Estimates PSD-matched (lambda, mu^2) shrinkage parameters
    (``auto_params``, the reference's feature-matching estimator) and runs
    the exact-variance colored two-stage core — the recommended entry
    point for arbitrary stationary noise.

    Measured against fresh runs of the reference C binaries on a NATURAL
    128^2 scene (05.png crop) this lands at or above the oracle on all 12
    measured noise conditions: the 9 experiment families gw/g1-g4(/w)
    from -0.19 (g1) to +1.28 dB (g3w), and lowpass / aniso / pink smooth
    PSDs +0.24 / -0.13 / +0.24 dB (``TestNaturalOracleParity``). The
    approximate path without ``exact``/``auto_params`` trails by
    0.4-1.8 dB.

    ``pilot_lambda`` overrides the HT-stage threshold multiplier alone
    (the HT output only serves as the Wiener pilot). On natural content
    the estimated lambda is best; on strongly patch-sparse scenes
    (synthetic patterns, graphics) under NARROWBAND noise, a hard pilot
    (``pilot_lambda=8``) removes the correlated in-band residual that
    otherwise self-confirms through the empirical-Wiener cp^2 term, and is
    worth 1.5-15 dB there (sinusoid-scene measurement: g2 30.8->34.8,
    g3 35.2->50.4 vs C-oracle 33.5/49.1).

    ``gate_concentration`` optionally pre-applies ``spectral_gate`` at
    that threshold. Multi-seed measurement on the narrowband families:
    the gate is a wash on g2 (31.05 vs 31.07 mean) and loses ~1.8 dB mean
    on g3 (30.2 vs 32.0) — but with much LOWER realization variance
    (28.4-32.0 vs 25.0-39.9). Disabled by default for the better mean;
    enable it when worst-case robustness on oscillatory noise matters.
    """
    if gate_concentration is not None:
        z, psd = spectral_gate(z, psd, gate_concentration)
    floor = float(np.mean(psd)) * 1e-3 + 1e-20
    psd_g = np.maximum(psd, floor)
    if auto_params:
        from pnp_admm_cnc_mri_tpu.priors.bm3d import psd_params

        lam, mu2, _, _ = psd_params.estimate_parameters_for_psd(
            psd_params.shrink_and_normalize_psd(psd_g))
        profile = dataclasses.replace(profile, lambda_thr3d=lam, mu2=mu2)
    if pilot_lambda is None and adaptive_pilot:
        try:
            pilot_lambda = adaptive_pilot_lambda(np.asarray(z), psd_g)
        except Exception:  # traced z: keep the estimated lambda
            pilot_lambda = None
    if pilot_lambda is not None:
        profile = dataclasses.replace(profile, lambda_thr3d=pilot_lambda)
    return bm3d_colored(z, psd_g, profile, exact=exact)
