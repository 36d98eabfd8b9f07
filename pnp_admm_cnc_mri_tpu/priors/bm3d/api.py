"""Reference-compatible BM3D API surface: staged calls, block-match reuse,
RGB, and deblurring entries.

Mirrors the public functions of ``bm3d307/bm3d/__init__.py``:

- ``bm3d(z, sigma, stage_arg=...)``: pass a precomputed HT estimate to run
  only the Wiener stage (reference ``:216-224``).
- ``bm3d_with_blockmatches``: compute-once / reuse block matching, the
  reference's ``blockmatches=(True, True)`` round-trip
  (``bm3d_ctypes.py:242-255``, tested in
  ``tests/bm3d_input_consistency.py:45-49``).
- ``bm3d_rgb``: opponent-color-space processing with luminance-driven
  matching (reference ``:391-438``).
- ``bm3d_deblurring``: regularized-inverse prefilter + collaborative
  filtering (reference ``:335-388``); the colored residual noise is
  approximated by its average std (white-noise core), documented
  deviation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.priors.bm3d import core, transforms as tr


class BlockMatches(NamedTuple):
    """Reusable block-matching result for one stage."""

    pos: jnp.ndarray  # (G, K, 2) matched top-left positions
    counts: jnp.ndarray  # (G,) power-of-2 group sizes


# Opponent color transform (reference __init__.py rgb handling)
_OPP = np.array(
    [
        [1 / 3, 1 / 3, 1 / 3],
        [0.5, 0.0, -0.5],
        [0.25, -0.5, 0.25],
    ]
)
_OPP_INV = np.linalg.inv(_OPP)


def compute_blockmatches(
    img: jnp.ndarray, profile: core.BM3DProfile, stage: str = "ht"
) -> BlockMatches:
    """Run only the block-matching of a stage (match on ``img``)."""
    p = profile
    bs = p.bs_ht if stage == "ht" else p.bs_wie
    h, w = img.shape
    nh, nw = h - bs + 1, w - bs + 1
    ref_i = core._ref_grid(nh, p.step_ht if stage == "ht" else p.step_wie)
    offs = core._offsets(p.search_ht if stage == "ht" else p.search_wie, bs)
    tau = (
        (p.tau_match_ht if stage == "ht" else p.tau_match_wie)
        * p.tau_scale * (bs * bs) / (255.0**2)
    )
    pos, counts = core._match(img, ref_i, offs, bs,
                              p.max_3d_ht if stage == "ht" else p.max_3d_wie, tau)
    return BlockMatches(pos, counts)


def bm3d(
    z: jnp.ndarray,
    sigma,
    profile: core.BM3DProfile | str = core.DEFAULT_PROFILE,
    stage_arg=None,
    prefilter: Optional[bool] = None,
):
    """Reference-style entry: ``stage_arg`` may be an HT estimate array, in
    which case only the Wiener stage runs (reference ``:216-224``).

    ``profile`` may be a ``BM3DProfile`` or a name from ``core.PROFILES``
    ('np', 'refilter', 'vn', 'lc', 'vn_old', 'high', 'deb' — reference
    ``_select_profile``); a refiltering profile routes scalar-sigma calls
    through ``bm3d_refilter``. ``sigma`` may also be a 2-D PSD array (the
    reference's ``bm3d(z, sigma_psd)`` form): flat PSDs route to the
    white-noise fast path, others to the exact-variance colored core
    (``core.bm3d_colored_auto``).
    """
    profile = core.get_profile(profile)
    sig_np = np.asarray(sigma)
    if profile.denoise_residual and sig_np.ndim < 2 and stage_arg is None:
        return bm3d_refilter(z, sigma, profile=dataclasses.replace(
            profile, denoise_residual=False))
    if sig_np.ndim >= 2:
        h, w = z.shape[-2:]
        if sig_np.shape[-2:] != (h, w):
            raise ValueError(
                f"PSD shape {sig_np.shape[-2:]} must match the image "
                f"shape {(h, w)} (the var*H*W convention ties the PSD to "
                "the image grid)")
        flat = np.ptp(sig_np) <= 1e-9 * max(float(sig_np.max()), 1e-30)
        if stage_arg is not None:
            # Wiener-only with a PSD (reference accepts an estimate in
            # stage_arg uniformly with PSD inputs, __init__.py:216-224 +
            # :299-318): white PSDs reduce to the scalar-sigma stage,
            # colored ones run the exact-variance colored Wiener stage
            # with the PSD-estimated mu^2.
            pilot = jnp.asarray(stage_arg, z.dtype)
            if flat:
                return core.wiener_stage(
                    z, pilot, jnp.asarray(
                        np.sqrt(sig_np.mean() / (h * w)), z.dtype), profile)
            psd_g, prof = _auto_profile(sig_np, profile)
            stds_wie = core.psd_to_coeff_stds(
                psd_g, prof.transform_wie, prof.bs_wie)
            cov_wie = jnp.asarray(core.coeff_cov_field(
                psd_g, prof.transform_wie, prof.bs_wie))
            return core.wiener_stage_colored(
                z, pilot, stds_wie, prof, cov_field=cov_wie)
        if flat:
            return core.bm3d(z, float(np.sqrt(sig_np.mean() / (h * w))),
                             profile, prefilter=prefilter)
        return core.bm3d_colored_auto(z, sig_np, profile)
    if stage_arg is not None:
        return core.wiener_stage(z, jnp.asarray(stage_arg, z.dtype),
                                 jnp.asarray(sigma, z.dtype), profile)
    if profile.exact_white:
        # named variants route white noise through the exact-variance
        # colored core (see BM3DProfile.exact_white); requires a concrete
        # sigma — traced values fall back to the fast white path
        try:
            sv = float(sig_np)
        except Exception:
            sv = None
        if sv is not None:
            h, w = z.shape[-2:]
            return core.bm3d_colored(
                z, np.full((h, w), sv**2 * h * w), profile, exact=True)
    return core.bm3d(z, sigma, profile, prefilter=prefilter)


def _auto_profile(psd: np.ndarray, profile: core.BM3DProfile):
    """Guarded PSD + PSD-estimated (lambda, mu^2) profile, the shared
    preprocessing of ``core.bm3d_colored_auto`` (reference parameter
    estimation ``__init__.py:633-717``)."""
    floor = float(np.mean(psd)) * 1e-3 + 1e-20
    psd_g = np.maximum(np.asarray(psd, np.float64), floor)
    from pnp_admm_cnc_mri_tpu.priors.bm3d import psd_params

    lam, mu2, _, _ = psd_params.estimate_parameters_for_psd(
        psd_params.shrink_and_normalize_psd(psd_g))
    return psd_g, dataclasses.replace(profile, lambda_thr3d=lam, mu2=mu2)


def bm3d_with_blockmatches(
    z: jnp.ndarray,
    sigma,
    profile: core.BM3DProfile = core.DEFAULT_PROFILE,
    bm_ht: Optional[BlockMatches] = None,
    bm_wie: Optional[BlockMatches] = None,
) -> Tuple[jnp.ndarray, BlockMatches, BlockMatches]:
    """Two-stage BM3D that returns (and optionally reuses) block matches.

    Reusing matches across calls on correlated inputs is the reference's
    ``blockmatches`` feature; here it also removes the matching cost when
    denoising several channels of one image.
    """
    sigma = jnp.asarray(sigma, z.dtype)
    if bm_ht is None:
        bm_ht = compute_blockmatches(z, profile, "ht")
    yb = _ht_with_matches(z, sigma, profile, bm_ht)
    if bm_wie is None:
        bm_wie = compute_blockmatches(yb, profile, "wie")
    y = _wiener_with_matches(z, yb, sigma, profile, bm_wie)
    return y, bm_ht, bm_wie


def _ht_with_matches(z, sigma, p, bm: BlockMatches):
    return _stage_with_matches(z, None, sigma, p, bm, mode="ht")


def _wiener_with_matches(z, pilot, sigma, p, bm: BlockMatches):
    return _stage_with_matches(z, pilot, sigma, p, bm, mode="wie")


def _stage_with_matches(z, pilot, sigma, p: core.BM3DProfile, bm: BlockMatches, mode):
    """Run a filtering stage with externally supplied matches (shares the
    group-filter/aggregation path of core.ht_stage/wiener_stage).

    ``sigma`` is either a scalar noise std (white noise — original path,
    kept numerically identical) or a (bs*bs,) vector of per-coefficient
    stds from ``core.psd_to_coeff_stds`` (colored PSD: the thresholds /
    Wiener variances and group weights follow core.ht_stage_colored /
    wiener_stage_colored's position-independent formulas)."""
    h, w = z.shape
    bs = p.bs_ht if mode == "ht" else p.bs_wie
    nh, nw = h - bs + 1, w - bs + 1
    kind = p.transform_ht if mode == "ht" else p.transform_wie
    t2f, t2i = tr.transform_pair(bs, kind,
                                 p.dec_level if mode == "ht" else 0)
    k2f = jnp.asarray(np.kron(t2f, t2f), z.dtype)
    k2i = jnp.asarray(np.kron(t2i, t2i), z.dtype)

    colored = jnp.ndim(sigma) >= 1
    t2b_z = core._extract_blocks(z, bs) @ k2f.T
    gz = core._group_coeffs(t2b_z, bm.pos, nw)
    k_max = p.max_3d_ht if mode == "ht" else p.max_3d_wie
    sizes, haar_f, haar_i = core._haar_bank(k_max)
    g = gz.shape[0]
    hat = jnp.zeros_like(gz)
    wts = jnp.zeros((g, k_max), gz.dtype)

    if mode == "wie":
        t2b_p = core._extract_blocks(pilot, bs) @ k2f.T
        gp = core._group_coeffs(t2b_p, bm.pos, nw)
        if colored:
            vars_w = jnp.asarray(sigma, z.dtype) ** 2 * p.mu2
        else:
            sigma_w = sigma * p.mu2**0.5
    else:
        thr = p.lambda_thr3d * jnp.asarray(sigma, z.dtype)
        if colored:
            vars_d = jnp.asarray(sigma, z.dtype) ** 2
            floor = jnp.mean(vars_d)

    for s, hf, hi in zip(sizes, haar_f, haar_i):
        cz = jnp.einsum("st,gtc->gsc", hf, gz[:, :s, :])
        if mode == "ht":
            keep = jnp.abs(cz) > thr
            cz = jnp.where(keep, cz, 0.0)
            if colored:
                kept_var = jnp.sum(keep * vars_d, axis=(1, 2))
                w_g = 1.0 / jnp.maximum(kept_var, floor + 1e-12)
            else:
                nnz = jnp.sum(keep, axis=(1, 2)).astype(gz.dtype)
                w_g = 1.0 / (sigma**2 * jnp.maximum(nnz, 1.0))
        else:
            cp = jnp.einsum("st,gtc->gsc", hf, gp[:, :s, :])
            if colored:
                wien = cp**2 / (cp**2 + vars_w)
                w_g = 1.0 / jnp.maximum(
                    jnp.sum(wien**2 * vars_w, axis=(1, 2)), 1e-10)
            else:
                wien = cp**2 / (cp**2 + sigma_w**2)
                w_g = 1.0 / (sigma_w**2 * jnp.maximum(jnp.sum(wien**2, axis=(1, 2)), 1e-10))
            cz = cz * wien
        blocks_s = jnp.einsum("ts,gsc->gtc", hi, cz)
        blocks_s = jnp.pad(blocks_s, ((0, 0), (0, k_max - s), (0, 0)))
        sel = (bm.counts == s)[:, None, None]
        hat = jnp.where(sel, blocks_s, hat)
        w_b = jnp.pad(jnp.broadcast_to(w_g[:, None], (g, s)), ((0, 0), (0, k_max - s)))
        wts = jnp.where(sel[:, :, 0], w_b, wts)

    window = tr.kaiser_window(bs, p.beta if mode == "ht" else p.beta_wie)
    return core._aggregate((h, w), hat @ k2i.T, wts, bm.pos, window)


def bm3d_multichannel(
    z: jnp.ndarray, sigma, profile: core.BM3DProfile = core.DEFAULT_PROFILE
) -> jnp.ndarray:
    """Generic multichannel BM3D: ``(H, W, C)`` input, block matching
    performed only on the FIRST channel and shared by all channels in both
    stages (the reference package's multichannel path, demonstrated by
    ``bm3d307/examples/bm3d_demo_multichannel.py:5-7``).

    ``sigma`` is a scalar std, a length-C per-channel std vector, or a PSD
    — ``(H, W)`` shared across channels or ``(H, W, C)`` per channel, like
    the reference's ``sigma_psd: either MxN or MxNxC``
    (``__init__.py:171-173``). Colored PSDs run per-channel
    PSD-estimated (lambda, mu^2) and per-coefficient variances while the
    block matching stays shared from the first channel.
    """
    if z.ndim != 3:
        raise ValueError("bm3d_multichannel expects (H, W, C)")
    h, w, c = z.shape
    sig_np = np.asarray(sigma, np.float64)

    # Per-channel (sigma-or-stds, profile) pairs; scalar sigma = white.
    chan: list = []
    if sig_np.ndim >= 2:
        if sig_np.ndim == 2:
            psds = [sig_np] * c
        elif sig_np.shape == (h, w, c):
            psds = [sig_np[..., ch] for ch in range(c)]
        else:
            raise ValueError(
                f"PSD shape {sig_np.shape} must be (H, W) or (H, W, C) "
                f"for image shape {(h, w, c)}")
        for psd in psds:
            if np.ptp(psd) <= 1e-9 * max(float(psd.max()), 1e-30):
                chan.append((jnp.asarray(
                    np.sqrt(psd.mean() / (h * w)), z.dtype), profile))
            else:
                psd_g, prof = _auto_profile(psd, profile)
                chan.append((psd_g, prof))
    else:
        sigs = np.broadcast_to(np.atleast_1d(sig_np), (c,))
        chan = [(jnp.asarray(s, z.dtype), profile) for s in sigs]

    def _stds(entry, stage):
        s, prof = entry
        if isinstance(s, np.ndarray) and s.ndim == 2:  # guarded PSD
            kind = prof.transform_ht if stage == "ht" else prof.transform_wie
            bs = prof.bs_ht if stage == "ht" else prof.bs_wie
            return jnp.asarray(core.psd_to_coeff_stds(
                s, kind, bs,
                dec_level=prof.dec_level if stage == "ht" else 0), z.dtype)
        return s

    bm_ht = compute_blockmatches(z[..., 0], profile, "ht")
    pilots = [
        _ht_with_matches(z[..., ch], _stds(chan[ch], "ht"), chan[ch][1],
                         bm_ht)
        for ch in range(c)
    ]
    bm_wie = compute_blockmatches(pilots[0], profile, "wie")
    outs = [
        _wiener_with_matches(z[..., ch], pilots[ch],
                             _stds(chan[ch], "wie"), chan[ch][1], bm_wie)
        for ch in range(c)
    ]
    return jnp.stack(outs, axis=-1)


def bm3d_rgb(
    z_rgb: jnp.ndarray, sigma, profile: core.BM3DProfile = core.DEFAULT_PROFILE
) -> jnp.ndarray:
    """Color BM3D: opponent color transform, luminance-driven block
    matching shared across channels (reference ``bm3d_rgb``).

    z_rgb: (H, W, 3) in [0, 1]; sigma: scalar std (per RGB channel).
    """
    opp = jnp.einsum("ct,hwt->hwc", jnp.asarray(_OPP, z_rgb.dtype), z_rgb)
    # per-channel noise std scales with the transform row norms
    row_scales = np.sqrt((np.asarray(_OPP) ** 2).sum(axis=1))
    sigma = jnp.asarray(sigma, z_rgb.dtype)

    y_lum = opp[..., 0]
    bm_ht = compute_blockmatches(y_lum, profile, "ht")
    pilots = []
    for c in range(3):
        pilots.append(
            _ht_with_matches(opp[..., c], sigma * row_scales[c], profile, bm_ht)
        )
    bm_wie = compute_blockmatches(pilots[0], profile, "wie")
    outs = []
    for c in range(3):
        outs.append(
            _wiener_with_matches(
                opp[..., c], pilots[c], sigma * row_scales[c], profile, bm_wie
            )
        )
    out_opp = jnp.stack(outs, axis=-1)
    return jnp.einsum("ct,hwt->hwc", jnp.asarray(_OPP_INV, z_rgb.dtype), out_opp)


def bm3d_deblurring(
    z: jnp.ndarray,
    sigma,
    psf: jnp.ndarray,
    profile: core.BM3DProfile = core.DEFAULT_PROFILE,
    reg: Optional[float] = None,
    colored: bool = True,
) -> jnp.ndarray:
    """Deblurring via regularized inverse + collaborative filtering
    (reference ``bm3d_deblurring:92-135``).

    z = blurred + noise; psf: blur kernel. The regularized-inverse
    residual noise is colored (PSD ``sigma^2 H W |inv|^2``); by default it
    feeds the exact-variance colored core (measured +3.1/+3.9 dB over the
    band-average white approximation on separable-3 / Gaussian-5 blurs).
    ``colored=False`` falls back to the white band-average core — the only
    option when ``sigma`` is a traced value, since the colored path builds
    host-side covariance fields. ``reg`` scales the Tikhonov term
    ``reg * sigma^2 * H * W``; when None it defaults per path: the
    reference's ``regularization_alpha_ri = 4e-4`` (``__init__.py:120``)
    for the colored core (swept optimal: 43.4/30.7 dB on the test/demo
    scenes), but 1e-2 for the white fallback, whose band-average
    approximation degrades as the weaker Tikhonov lets ``|inv|`` grow
    (25.9 dB at 4e-4 vs 36.6 at 1e-2 on the test scene).
    """
    if reg is None:
        reg = 4e-4 if colored else 1e-2
    from pnp_admm_cnc_mri_tpu.ops import sisr

    h, w = z.shape
    otf = sisr.psf2otf(jnp.asarray(psf, z.dtype), (h, w))
    sigma = jnp.asarray(sigma, z.dtype)
    # Tikhonov-regularized inverse filter
    inv = jnp.conj(otf) / (jnp.abs(otf) ** 2 + reg * sigma**2 * h * w)
    zi = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(z) * inv))
    if colored:
        psd_col = np.asarray(sigma, np.float64) ** 2 * h * w * np.abs(
            np.asarray(inv)) ** 2
        return core.bm3d_colored_auto(zi.astype(z.dtype), psd_col, profile)
    # residual noise PSD |inv|^2 sigma^2 -> average std for the core
    sigma_eff = sigma * jnp.sqrt(jnp.mean(jnp.abs(inv) ** 2))
    return core.bm3d(zi, sigma_eff, profile, prefilter=False)


def estimate_parameters_for_psd(psd: np.ndarray):
    """Auto-select (lambda_thr3d, mu2, lambda_re, mu2_re) from a PSD.

    Delegates to ``psd_params.estimate_parameters_for_image_psd`` — the
    canonical 65x65 normalization plus full feature-database matching
    (exact vs the reference estimator; white PSDs of any size yield the
    golden (3.0, 0.4, 2.5, 3.6)), with a white-constants fallback when the
    database asset is absent.
    """
    from pnp_admm_cnc_mri_tpu.priors.bm3d import psd_params

    try:
        return psd_params.estimate_parameters_for_image_psd(
            np.asarray(psd, np.float64)
        )
    except FileNotFoundError:
        raise
    except Exception:
        # degraded environment (scipy pieces missing): white fallback
        flat = float(np.std(psd) / (np.mean(psd) + 1e-12))
        if flat < 0.1:
            return 3.0, 0.4, 2.5, 3.6
        raise


def get_filtered_residual(
    z: jnp.ndarray, y_hat: jnp.ndarray, sigma, residual_thr: float = 3.0
):
    """Global-FFT hard-thresholded residual (reference
    ``get_filtered_residual:337-388``, white-noise / circular path).

    Returns (remains, remains_psd) like the reference: the significant
    leftover structure in ``z - y_hat`` and the colored PSD of the noise
    retained with it (the input white PSD masked to the detected band).
    The band-average std is ``sqrt(mean(remains_psd) / (H W))``.
    """
    h, w = z.shape[-2:]
    resid = jnp.fft.fft2(z - y_hat, axes=(-2, -1))
    psd = sigma**2 * h * w  # white PSD per bin

    exceed = (jnp.abs(resid) > residual_thr * jnp.sqrt(psd)).astype(z.dtype)
    # dilate the detection mask with a small wrap-around Gaussian
    ks = int(np.ceil(h / 150))
    ks += 1 - ks % 2
    g1 = np.exp(-np.arange(-(ks // 2), ks // 2 + 1) ** 2 / (2.0 * max(h / 500, 0.5) ** 2))
    kern = np.outer(g1, g1)
    kern_f = jnp.fft.fft2(
        jnp.asarray(np.roll(np.pad(kern, ((0, h - ks), (0, w - ks))),
                            (-(ks // 2), -(ks // 2)), axis=(0, 1)), z.dtype)
    )
    cc = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(exceed) * kern_f))
    msk = cc > 0.01

    remains = jnp.real(jnp.fft.ifft2(resid * msk, axes=(-2, -1)))
    remains_psd = psd * msk.astype(z.dtype)
    return remains, remains_psd


def bm3d_refilter(
    z: jnp.ndarray,
    sigma,
    profile: core.BM3DProfile = core.DEFAULT_PROFILE,
    residual_thr: float = 3.0,
    lambda_re: float = 2.5,
    mu2_re: float = 3.6,
    colored: bool = False,
) -> jnp.ndarray:
    """Two-stage BM3D with residual refiltering (the reference's
    ``denoise_residual=True`` / BM3DProfileRefilter path, ``:276-318``):
    leftover structure that the first pass thresholded away is detected in
    the Fourier residual and re-denoised with the refiltering parameters
    (reference white-PSD auto values lambda_re=2.5, mu2_re=3.6).

    ``colored=True`` feeds the remains' true colored PSD to the
    exact-variance colored core (the reference-faithful variant; measured
    quality-neutral, -0.06 dB mean across seeds vs the band-average white
    default, at ~2x cost). It materializes the PSD host-side, so it is
    unavailable under tracing — the jittable band-average path is the
    default.
    """
    import dataclasses

    sigma = jnp.asarray(sigma, z.dtype)
    y1 = core.bm3d(z, sigma, profile)

    remains, remains_psd = get_filtered_residual(z, y1, sigma, residual_thr)
    prof_re = dataclasses.replace(profile, lambda_thr3d=lambda_re, mu2=mu2_re)
    z2 = y1 + remains
    if colored:
        psd_np = np.asarray(remains_psd, np.float64)
        if psd_np.max() <= 0.0:
            return y1  # nothing significant remained
        return core.bm3d_colored(
            z2, np.maximum(psd_np, psd_np.max() * 1e-4), prof_re, exact=True)
    h, w = z.shape[-2:]
    sigma_re = jnp.sqrt(jnp.mean(remains_psd) / (h * w))
    # guard: if nothing significant remains, the refilter input == y1 and
    # sigma_re ~ 0 -> the second pass is a near-identity
    sigma_re = jnp.maximum(sigma_re, 1e-4)
    return core._bm3d_jit(z2, sigma_re, prof_re, "all", False)
