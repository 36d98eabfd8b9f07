"""Masked 2-D Fourier forward model and the ADMM data-consistency solve.

The reference implements the physics inline with NumPy index assignment
(reference ``【1】ADMM_L1.py:97-120``):

    y = fft2(img) * mask + noises
    xf = fft2(z - w); xf[index] = (La2*xf[index] + y[index]) / (1 + La2)
    x = |real(ifft2(xf))|          with La2 = 1/(2*rho)

Here the same math is expressed as batched, jit-friendly ``jnp.where``
blends over the last two (H, W) axes — no scatter, fully fusable by XLA,
and valid for arbitrary leading batch dimensions.

All functions treat the trailing two axes as the image plane and broadcast
over any leading axes, so the same code serves a single 256x256 image and a
sharded (images x masks x sigmas) scenario grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fft2(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized 2-D FFT over the trailing two axes (NumPy convention)."""
    return jnp.fft.fft2(x, axes=(-2, -1))


def ifft2(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized 2-D inverse FFT over the trailing two axes."""
    return jnp.fft.ifft2(x, axes=(-2, -1))


def observe(img: jnp.ndarray, mask: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Synthesize k-space observations ``y = F(img) * mask + noise``.

    Mirrors reference ``【1】ADMM_L1.py:99``. Note the noise is added over the
    *full* k-space plane (not only sampled entries) — the data-consistency
    solve only ever reads ``y`` at sampled locations, so this matches the
    reference bit-for-bit where it matters.
    """
    return fft2(img) * mask + noise


def zero_fill(y: jnp.ndarray) -> jnp.ndarray:
    """Zero-filled reconstruction ``ifft2(y)`` (reference ``【1】:100``).

    Returns the complex image; callers take ``abs`` for the magnitude init
    (reference ``【1】:103``).
    """
    return ifft2(y)


def data_term_gradient(
    x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Gradient of the data-fidelity term: ``A^H (A x - y)``.

    Reference ``utils/utils.py:50-55`` (``Df``): ``ifft2(mask*fft2(x) - y)``
    with y read only at sampled locations. Returns the complex gradient
    image (callers take real/abs as needed). Useful for gradient-based
    solvers (FISTA/PGD variants) beyond the ADMM family.
    """
    res = fft2(x) * mask
    res = jnp.where(mask != 0, res - y, res)
    return ifft2(res)


def _dft_mats(n: int, dtype):
    """On-device (cos, sin) DFT matrices: M[k, j] = trig(2 pi k j / n).

    Built from ``jnp.arange`` (device-side iota under jit) rather than
    NumPy constants so nothing crosses the host->device boundary — the
    axon TPU tunnel stalls on MB-scale transfers. The phase product is
    reduced mod n in integers before the float scale, so angles stay in
    [0, 2 pi) and the matrices are accurate even when the caller computes
    in float32/bfloat16 (unreduced k*j reaches (n-1)^2 — unrepresentable
    in bf16 and ~275x less accurate in f32).
    """
    trig_dtype = jnp.promote_types(dtype, jnp.float32)
    k = jnp.arange(n, dtype=jnp.int32)
    kj = jnp.outer(k, k) % n
    ang = (2.0 * jnp.pi / n) * kj.astype(trig_dtype)
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def matmul_rfft2(x: jnp.ndarray, mats=None):
    """rfft2 over the trailing (H, W) axes as MXU matmuls.

    Returns (real, imag) of shape (..., H, W//2+1). A 256-point DFT is two
    small matmuls per axis — on TPU these run on the systolic array and
    beat the generic FFT kernel for the small power-of-two sizes this
    framework lives at (the reference images are 256x256,
    ``CS_MRI/Q_*.mat``). Any H/W is supported.

    ``mats``: optional precomputed ``(cw, sw, ch, sh)`` from ``_dft_mats``
    — pass these when calling inside a scanned loop so the trig matrices
    are built once and captured as loop invariants rather than
    re-emitted in every iteration body.
    """
    h, w = x.shape[-2], x.shape[-1]
    wh = w // 2 + 1
    if mats is None:
        cw, sw = _dft_mats(w, x.dtype)
        ch, sh = _dft_mats(h, x.dtype)
    else:
        cw, sw, ch, sh = mats
    # Precision.HIGH (bf16_3x): the MXU's default single-pass bf16
    # multiply costs ~0.5 dB of reconstruction quality at f32; the 3-pass
    # scheme restores full f32 accuracy and measures FASTER end-to-end
    # than both the fp32 6-pass path and the generic FFT kernel (33.5 vs
    # 38.7/39.7 ms for the 50-iter set1 solve on v5e).
    P = jax.lax.Precision.HIGH
    ein = functools.partial(jnp.einsum, precision=P)
    # rows (W axis), half spectrum: X = x @ (cos - i sin)^T
    xr = ein("...hw,wk->...hk", x, cw[:, :wh])
    xi = -ein("...hw,wk->...hk", x, sw[:, :wh])
    # columns (H axis), full complex DFT: (c - i s)(xr + i xi)
    yr = ein("mh,...hk->...mk", ch, xr) + ein("mh,...hk->...mk", sh, xi)
    yi = ein("mh,...hk->...mk", ch, xi) - ein("mh,...hk->...mk", sh, xr)
    return yr, yi


def matmul_irfft2(yr: jnp.ndarray, yi: jnp.ndarray, h: int, w: int,
                  mats=None) -> jnp.ndarray:
    """Inverse of ``matmul_rfft2`` for a Hermitian half-spectrum.

    (real, imag) of shape (..., H, W//2+1) -> real (..., H, W).
    ``mats``: see ``matmul_rfft2``.
    """
    wh = w // 2 + 1
    if mats is None:
        cw, sw = _dft_mats(w, yr.dtype)
        ch, sh = _dft_mats(h, yr.dtype)
    else:
        cw, sw, ch, sh = mats
    P = jax.lax.Precision.HIGH  # see matmul_rfft2
    ein = functools.partial(jnp.einsum, precision=P)
    # columns first: inverse complex DFT along H (conjugate transform / H)
    xr = (ein("hm,...hk->...mk", ch, yr) - ein("hm,...hk->...mk", sh, yi)) / h
    xi = (ein("hm,...hk->...mk", ch, yi) + ein("hm,...hk->...mk", sh, yr)) / h
    # rows: real synthesis from the half spectrum. Bin weights double the
    # interior bins (their conjugate twins are implicit); DC and — for
    # even W — Nyquist appear once.
    wk = jnp.full((wh,), 2.0, yr.dtype)
    wk = wk.at[0].set(1.0)
    if w % 2 == 0:
        wk = wk.at[wh - 1].set(1.0)
    return (ein("...hk,kw->...hw", xr * wk, cw[:wh, :])
            - ein("...hk,kw->...hw", xi * wk, sw[:wh, :])) / w


def _packed_dc_mats(h: int, w: int, dtype):
    """One-time DFT matrices for the Nyquist-packed matmul DC solve (even W).

    The rfft half-grid is ``wh = w//2 + 1`` wide — 129 at the framework's
    256px working size. MXU lane tiles are 128 wide, so every einsum over
    that dim pads 129 -> 256: a measured 2x waste (docs/PERF.md
    "Lane-packing probe"). For even W the DC (k=0) and Nyquist (k=w/2)
    row-transform outputs are both REAL, and the sin matrix's DC column
    (``sin(0) = 0``) contributes nothing — so the Nyquist column can ride
    the existing einsums in that dead slot via ONE-TIME matrix edits,
    with zero per-iteration packing traffic (the failure mode of the
    concat-based packing probe):

    - forward: ``swf[:, 0] = -(-1)^j`` makes ``xi[..., 0] = x @ (-1)^j``
      = the real Nyquist column, so the H-axis complex DFT of column 0
      computes ``DFT(DC + i*Nyq)`` — the classic two-real-FFTs-in-one
      packing, recoverable by Hermitian split.
    - inverse: ``swi[0, :] = -(-1)^w`` makes the (otherwise dead,
      ``sin(0)=0``) imag slot of column 0 synthesize the Nyquist
      contribution ``x~_nyq * (-1)^w``.

    Also returns ``ch - sh`` / ``ch + sh`` for the 3-matmul Karatsuba
    complex product on the H axis (``(C - iS)(xr + i xi)`` needs only
    ``C xr``, ``S xi``, ``(C - S)(xr + xi)``), cutting the 8 H-axis
    matmuls per iteration to 6.
    """
    cw, sw = _dft_mats(w, dtype)
    ch, sh = (cw, sw) if h == w else _dft_mats(h, dtype)
    whp = w // 2
    alt = cw[:, whp]  # cos(pi*j) = (-1)^j
    cwf = cw[:, :whp]
    swf = sw[:, :whp].at[:, 0].set(-alt)
    cwi = cw[:whp, :]
    swi = sw[:whp, :].at[0, :].set(-alt)
    return cwf, swf, ch, sh, ch - sh, ch + sh, cwi, swi


# Probe toggles for the matmul DC solve — BOTH measured and REJECTED on
# the v5e (batch 512, 50-iter ADMM-L1; scripts/dc_formulation_probe.py +
# scripts/dc_micro_probe.py, docs/PERF.md "Nyquist-packing probe"):
# - packing: end-to-end 90.0-90.4k vs 95.8-96.4k unpacked image-iters/s.
#   Transforms alone are only +2.3% (XLA's lowering already recovers
#   nearly all of the 129->256 lane-pad waste); the per-iteration
#   unpack/blend/repack glue costs ~12%. Ceiling +2% — not exploitable.
# - Karatsuba H-axis: 86.5k vs 92.8k (packed baseline) — the extra
#   elementwise combines cost more than the one saved matmul.
# Both paths remain as tested capability (exactness proven to machine
# eps in tests/test_ops.py); packing requires even W.
_MATMUL_PACKED = False
_MATMUL_K3 = False


def resolve_dc_method(method: str, y) -> str:
    """'auto' -> 'matmul' on accelerator backends for small/medium images
    (the MXU DFT-as-matmul path, 2.6x on v5e at 256px), 'fft' on CPU or
    for large images where the O(N^2) DFT matrices stop paying off."""
    if method != "auto":
        return method
    try:
        platform = jax.devices()[0].platform
    except Exception:  # backend not initialized / unreachable
        return "fft"
    if platform == "cpu":
        return "fft"
    return "matmul" if max(y.shape[-2:]) <= 1024 else "fft"


def make_rfft_data_consistency(y: jnp.ndarray, mask: jnp.ndarray, rho,
                               method: str = "fft"):
    """Half-spectrum (rfft) data-consistency solve — 2x less FFT work.

    The reference's x-update is ``x = |real(ifft2(F))|`` with
    ``F = where(m, (La2 V + y)/(1+La2), V)`` and ``V = fft2(v)`` of a REAL
    v. Since only the real part survives, only the Hermitian part of F
    matters:  H(k) = (F(k) + conj(F(-k)))/2. Expanding with V Hermitian
    (v real) gives a closed form on the rfft half-grid:

        H = A .* V_half + C,
        A = (2 - m - m~)/2 + La2 (m + m~) / (2 (1 + La2))        (real)
        C = (m .* y + m~ .* conj(y(-k))) / (2 (1 + La2))         (complex)

    with ``m~(k) = m(-k)``. A and C are precomputed once; every iteration
    is then rfft2 -> one fused multiply-add -> irfft2 — exactly half the
    FFT flops and memory traffic of the full-spectrum path, bit-equal in
    exact arithmetic (tested to f64 precision).

    ``method='matmul'`` computes the transforms as MXU matmuls
    (``matmul_rfft2``/``matmul_irfft2``) instead of the generic FFT
    kernel — the TPU-native fast path for the small image sizes this
    framework targets.

    Returns ``dc(v) -> x`` for real v of shape (..., H, W).
    """
    h, w = mask.shape[-2:]
    la2 = 1.0 / (2.0 * rho)
    # Match the full path's selection semantics exactly: sampled means
    # mask != 0 (not mask-weighted), and y is only ever read at sampled
    # entries (zero it elsewhere so NaN/garbage there cannot leak in).
    m = (mask != 0).astype(y.real.dtype)
    y = jnp.where(m != 0, y, 0.0)
    m_neg = jnp.roll(jnp.flip(m, axis=(-2, -1)), shift=(1, 1), axis=(-2, -1))
    y_neg_conj = jnp.conj(
        jnp.roll(jnp.flip(y, axis=(-2, -1)), shift=(1, 1), axis=(-2, -1))
    )
    half = w // 2 + 1
    a_full = (2.0 - m - m_neg) / 2.0 + la2 * (m + m_neg) / (2.0 * (1.0 + la2))
    c_full = (m * y + m_neg * y_neg_conj) / (2.0 * (1.0 + la2))
    a_half = a_full[..., :half]
    c_half = c_full[..., :half]

    if method == "matmul":
        cr = c_half.real
        ci = c_half.imag
        dt = y.real.dtype
        if _MATMUL_PACKED and w % 2 == 0:
            return _make_packed_matmul_dc(a_half, cr, ci, h, w, dt)
        mats = _dft_mats(w, dt)[0:2] + _dft_mats(h, dt)[0:2] if h != w else None
        if mats is None:
            cw, sw = _dft_mats(w, dt)
            mats = (cw, sw, cw, sw)

        def dc(v: jnp.ndarray) -> jnp.ndarray:
            m4 = tuple(m.astype(v.dtype) for m in mats)
            vr, vi = matmul_rfft2(v, m4)
            a = a_half.astype(v.dtype)
            return jnp.abs(matmul_irfft2(
                a * vr + cr.astype(v.dtype),
                a * vi + ci.astype(v.dtype), h, w, m4))

        return dc

    def dc(v: jnp.ndarray) -> jnp.ndarray:
        vf = jnp.fft.rfft2(v, axes=(-2, -1))
        hf = a_half * vf + c_half
        return jnp.abs(jnp.fft.irfft2(hf, s=(h, w), axes=(-2, -1)))

    return dc


def _make_packed_matmul_dc(a_half, cr, ci, h: int, w: int, dt):
    """Nyquist-packed MXU data-consistency solve (even W) — see
    ``_packed_dc_mats`` for the packing scheme and why it is free.

    Same math as the unpacked matmul path (bit-equal in exact arithmetic;
    tested to 1e-4 f32 / 1e-10 f64 against the rfft path), with every
    einsum exactly 128-lane-aligned at the 256px working size and the
    H-axis complex products done with 3 matmuls instead of 4
    (Karatsuba). Column 0 of the half-grid arrays carries the packed
    ``DC + i*Nyquist`` pair; the blend unpacks it by Hermitian split
    (both blended columns are Hermitian along H — the blend coefficients
    satisfy ``a(-k) = a(k)``, ``c(-k) = conj(c(k))`` on those columns —
    so the inverse H-transform of the re-packed column is exactly
    ``x~_dc + i*x~_nyq`` with both parts real).
    """
    whp = w // 2
    pmats = _packed_dc_mats(h, w, dt)
    # Blend coefficients: middle columns as a block; DC / Nyquist columns
    # (slots 0 and wh-1 of the half grid) handled through the packed slot.
    a128 = a_half[..., :whp]
    cr128 = cr[..., :whp]
    ci128 = ci[..., :whp]
    a0, aN = a_half[..., 0], a_half[..., -1]
    c0r, c0i = cr[..., 0], ci[..., 0]
    cNr, cNi = cr[..., -1], ci[..., -1]
    k3 = _MATMUL_K3

    def _rev(p):  # index reversal m -> (-m) mod h along the trailing axis
        return jnp.roll(jnp.flip(p, -1), 1, -1)

    def dc(v: jnp.ndarray) -> jnp.ndarray:
        cwf, swf, ch, sh, cms, cps, cwi, swi = (
            m.astype(v.dtype) for m in pmats)
        P = jax.lax.Precision.HIGH  # see matmul_rfft2
        ein = functools.partial(jnp.einsum, precision=P)
        # W axis: real DFT, 128 columns; xi[..., 0] = Nyquist (swf edit).
        xr = ein("...hw,wk->...hk", v, cwf)
        xi = -ein("...hw,wk->...hk", v, swf)
        # H axis: y = (C - iS)(xr + i xi).
        if k3:
            m1 = ein("mh,...hk->...mk", ch, xr)
            m2 = -ein("mh,...hk->...mk", sh, xi)
            m3 = ein("mh,...hk->...mk", cms, xr + xi)
            yr = m1 - m2
            yi = m3 - m1 - m2
        else:
            yr = ein("mh,...hk->...mk", ch, xr) + ein("mh,...hk->...mk", sh, xi)
            yi = ein("mh,...hk->...mk", ch, xi) - ein("mh,...hk->...mk", sh, xr)
        # Unpack column 0: P = DC + i*Nyq -> Hermitian split along H.
        pr, pi = yr[..., 0], yi[..., 0]
        prr, pir = _rev(pr), _rev(pi)
        dcr, dci = 0.5 * (pr + prr), 0.5 * (pi - pir)
        nqr, nqi = 0.5 * (pi + pir), 0.5 * (prr - pr)
        # Blend the two real-pair columns, then re-pack Q = H0 + i*HN.
        h0r = a0 * dcr + c0r
        h0i = a0 * dci + c0i
        hnr = aN * nqr + cNr
        hni = aN * nqi + cNi
        qr, qi = h0r - hni, h0i + hnr
        br = a128 * yr + cr128
        bi = a128 * yi + ci128
        br = br.at[..., 0].set(qr.astype(v.dtype))
        bi = bi.at[..., 0].set(qi.astype(v.dtype))
        br, bi = br.astype(v.dtype), bi.astype(v.dtype)
        # Inverse H axis: x~ = (C^T + iS^T)(br + i bi) / h.
        if k3:
            n1 = ein("hm,...hk->...mk", ch, br)
            n2 = ein("hm,...hk->...mk", sh, bi)
            n3 = ein("hm,...hk->...mk", cps, br + bi)
            tr = (n1 - n2) / h
            ti = (n3 - n1 - n2) / h
        else:
            tr = (ein("hm,...hk->...mk", ch, br)
                  - ein("hm,...hk->...mk", sh, bi)) / h
            ti = (ein("hm,...hk->...mk", ch, bi)
                  + ein("hm,...hk->...mk", sh, br)) / h
        # W-axis synthesis. Interior bins weight 2 (conjugate twins
        # implicit); the packed slot 0 carries DC in tr (weight 1, rides
        # cwi row 0 = ones) and Nyquist in ti (weight 1, rides the swi
        # row-0 edit = -(-1)^w through the minus sign below).
        wk = jnp.full((whp,), 2.0, v.dtype).at[0].set(1.0)
        out = (ein("...hk,kw->...hw", tr * wk, cwi)
               - ein("...hk,kw->...hw", ti * wk, swi)) / w
        return jnp.abs(out)

    return dc


def data_consistency(
    v: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    rho: jnp.ndarray | float,
) -> jnp.ndarray:
    """ADMM x-update: closed-form k-space data-consistency solve.

    Solves ``argmin_x ||A x - y||^2 + rho-weighted proximity to v`` where A
    is the masked FFT — diagonal in k-space, so the solve is a pointwise
    blend at sampled frequencies (reference ``【1】ADMM_L1.py:115-120``):

        xf     = fft2(v)
        xf[m]  = (La2 * xf[m] + y[m]) / (1 + La2),  La2 = 1/(2 rho)
        x      = |real(ifft2(xf))|

    The final ``abs`` of the real part is the reference's magnitude
    projection — numerically load-bearing for parity, kept intentionally.

    ``rho`` may be a python float or a (broadcastable) traced array, which
    lets schedules vary rho per scenario or per iteration without recompiles.
    """
    vf = fft2(v)
    la2 = 1.0 / (2.0 * rho)
    blended = (la2 * vf + y) / (1.0 + la2)
    xf = jnp.where(mask != 0, blended, vf)
    return jnp.abs(jnp.real(ifft2(xf)))
