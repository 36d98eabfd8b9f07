"""On-device procedural training corpora: unlimited leakage-free data.

VERDICT r2 #2: the clean-prior plateau was only ever probed at ~100-163
images with warm restarts — not a scale study. The generators here are
JAX ports of the ``train.corpus`` numpy families (dead leaves, 1/f
Gaussian fields, MRI ellipse phantoms) that run UNDER JIT ON THE TPU:
a 2048-image 128x128 corpus regenerates in ~1 s on device, so corpus
size becomes a free parameter (fixed-N for scaling-curve points,
periodic refresh for an effectively infinite stream) and ZERO image
bytes cross the axon tunnel.

Leakage-immune by construction: every image is synthesized from a PRNG
key; no evaluation image is ever touched. (The reference trains nothing
— its weights come from KAIR corpora, ``model_zoo/README.md:1-8``.)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _grid(size: int):
    yy, xx = jnp.mgrid[0:size, 0:size]
    return yy.astype(jnp.float32), xx.astype(jnp.float32)


def _gauss_blur_fft(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian blur of trailing (H, W) axes via FFT (periodic edges —
    irrelevant for training data)."""
    h, w = img.shape[-2], img.shape[-1]
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.fftfreq(w)[None, :]
    ker = jnp.exp(-2.0 * (jnp.pi * sigma) ** 2 * (fy**2 + fx**2))
    return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(img) * ker)).astype(img.dtype)


# ---------------------------------------------------------------------------
# Dead leaves (occlusion statistics; Achddou et al. 2021)


def dead_leaves(key, n: int, size: int = 128, rmin: float = 2.0,
                rmax: float = 40.0, alpha: float = 3.0,
                n_disks: int = 600, sigma_blur: float = 0.7) -> jnp.ndarray:
    """(n, size, size) float32 dead-leaves images, fully on device.

    Power-law radii r^-alpha (inverse-CDF sampled), uniform gray disks
    painted front-to-back ("paint only unfilled pixels") by a
    ``lax.scan`` over the disk list, light Gaussian blur for optics.
    """
    yy, xx = _grid(size)
    a1 = 1.0 - alpha

    def one(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        u = jax.random.uniform(k1, (n_disks,), jnp.float32)
        r = (rmin**a1 + u * (rmax**a1 - rmin**a1)) ** (1.0 / a1)
        c = jax.random.uniform(k2, (n_disks, 2), jnp.float32, 0.0, size)
        g = jax.random.uniform(k3, (n_disks,), jnp.float32)
        bg = jax.random.uniform(k4, (), jnp.float32, 0.2, 0.8)

        def body(carry, inp):
            img, filled = carry
            r_, cy, cx, g_ = inp
            m = ((xx - cx) ** 2 + (yy - cy) ** 2) <= r_ * r_
            img = jnp.where(m & ~filled, g_, img)
            return (img, filled | m), None

        init = (jnp.full((size, size), bg, jnp.float32),
                jnp.zeros((size, size), bool))
        (img, _), _ = jax.lax.scan(body, init, (r, c[:, 0], c[:, 1], g))
        return img

    imgs = jax.vmap(one)(jax.random.split(key, n))
    if sigma_blur > 0:
        imgs = _gauss_blur_fft(imgs, sigma_blur)
    return jnp.clip(imgs, 0.0, 1.0)


# ---------------------------------------------------------------------------
# 1/f^beta Gaussian random fields (multiscale-texture statistics)


def gaussian_fields(key, n: int, size: int = 128,
                    beta_range=(1.0, 2.5)) -> jnp.ndarray:
    """(n, size, size) float32 power-law-spectrum fields, min-max
    normalized per image."""
    fy = jnp.fft.fftfreq(size)[:, None]
    fx = jnp.fft.fftfreq(size)[None, :]
    rad = jnp.sqrt(fy**2 + fx**2).at[0, 0].set(1.0 / size)

    def one(k):
        kb, kr, ki = jax.random.split(k, 3)
        beta = jax.random.uniform(kb, (), jnp.float32, *beta_range)
        spec = (jax.random.normal(kr, (size, size), jnp.float32)
                + 1j * jax.random.normal(ki, (size, size), jnp.float32))
        img = jnp.real(jnp.fft.ifft2(spec * rad ** (-beta / 2.0)))
        lo, hi = img.min(), img.max()
        return ((img - lo) / jnp.maximum(hi - lo, 1e-12)).astype(jnp.float32)

    return jax.vmap(one)(jax.random.split(key, n))


# ---------------------------------------------------------------------------
# MRI-like ellipse phantoms (piecewise-smooth anatomy)


def mri_phantoms(key, n: int, size: int = 128,
                 max_ellipses: int = 12) -> jnp.ndarray:
    """(n, size, size) float32 Shepp-Logan-style random phantoms: skull
    ellipse + nested random-contrast ellipses + smooth bias field +
    light texture, all inside the skull support."""
    yy, xx = _grid(size)
    cy, cx = (size - 1) / 2.0, (size - 1) / 2.0

    def ellipse(ecy, ecx, a, b, th):
        yr = (yy - ecy) * jnp.cos(th) - (xx - ecx) * jnp.sin(th)
        xr = (yy - ecy) * jnp.sin(th) + (xx - ecx) * jnp.cos(th)
        return (yr / a) ** 2 + (xr / b) ** 2 <= 1.0

    def one(k):
        ks = jax.random.split(k, 8)
        skull = ellipse(
            cy, cx,
            size * jax.random.uniform(ks[0], (), jnp.float32, 0.33, 0.45),
            size * jax.random.uniform(ks[1], (), jnp.float32, 0.28, 0.40),
            jax.random.uniform(ks[2], (), jnp.float32, 0.0, jnp.pi))
        img = jnp.where(
            skull, jax.random.uniform(ks[3], (), jnp.float32, 0.55, 0.85), 0.0)

        n_ell = jax.random.randint(ks[4], (), max_ellipses // 2, max_ellipses + 1)
        ep = jax.random.uniform(ks[5], (max_ellipses, 6), jnp.float32)

        def body(img, inp):
            i, p = inp
            a = size * (0.03 + 0.19 * p[0])
            b = size * (0.03 + 0.19 * p[1])
            ecy = cy + (p[2] - 0.5) * 0.44 * size
            ecx = cx + (p[3] - 0.5) * 0.44 * size
            m = ellipse(ecy, ecx, a, b, p[4] * jnp.pi) & skull & (i < n_ell)
            return jnp.where(m, jnp.clip(img + (p[5] - 0.5) * 0.9, 0.05, 1.0),
                             img), None

        img, _ = jax.lax.scan(body, img,
                              (jnp.arange(max_ellipses), ep))
        kb, kt = jax.random.split(ks[6])
        bias = _gauss_blur_fft(jax.random.normal(kb, (size, size), jnp.float32), size / 6.0)
        bias = 1.0 + 0.25 * bias / jnp.maximum(jnp.abs(bias).max(), 1e-12)
        tex = _gauss_blur_fft(jax.random.normal(kt, (size, size), jnp.float32), 1.2)
        img = img * bias + 0.015 * tex * skull
        return jnp.clip(_gauss_blur_fft(img, 0.8), 0.0, 1.0)

    return jax.vmap(one)(jax.random.split(key, n))


# ---------------------------------------------------------------------------
# Elastic warps of seed images (in-domain MRI statistics)


def elastic_warps(key, seeds: jnp.ndarray, n: int, size: int = 128,
                  amp: float = 8.0, smooth: float = 16.0) -> jnp.ndarray:
    """(n, size, size) float32 diffeomorphic warps of ``seeds``
    ((K, H, W), staged on device once). Displacement fields are
    FFT-low-passed white noise + a small random affine; resampling is
    bilinear (``jax.scipy.ndimage.map_coordinates`` order=1)."""
    from jax.scipy.ndimage import map_coordinates

    k_seeds, h, w = seeds.shape
    yy, xx = _grid(size)
    scy, scx = (h - 1) / 2.0, (w - 1) / 2.0

    def one(k):
        ks = jax.random.split(k, 6)
        which = jax.random.randint(ks[0], (), 0, k_seeds)
        img = seeds[which]

        def field(kk):
            d = _gauss_blur_fft(jax.random.normal(kk, (size, size), jnp.float32), smooth)
            return d * (amp / jnp.maximum(jnp.abs(d).max(), 1e-12))

        dx, dy = field(ks[1]), field(ks[2])
        th = jax.random.uniform(ks[3], (), jnp.float32, -0.35, 0.35)
        sc = jax.random.uniform(ks[4], (), jnp.float32, 0.85, 1.15)
        # map output grid (size x size) onto source coords (h x w), with
        # a scale that covers the full seed image
        gy = (yy - (size - 1) / 2.0) * (h / size)
        gx = (xx - (size - 1) / 2.0) * (w / size)
        xr = (jnp.cos(th) * gx - jnp.sin(th) * gy) / sc + scx
        yr = (jnp.sin(th) * gx + jnp.cos(th) * gy) / sc + scy
        out = map_coordinates(img, [yr + dy, xr + dx], order=1, mode="reflect")
        return jnp.clip(out, 0.0, 1.0).astype(jnp.float32)

    return jax.vmap(one)(jax.random.split(key, n))


# ---------------------------------------------------------------------------
# Mixture


def make_generator(
    size: int = 128,
    mix=(0.35, 0.2, 0.3, 0.15),
    seeds: Optional[jnp.ndarray] = None,
    n_disks: int = 600,
) -> Callable[[jax.Array, int], jnp.ndarray]:
    """Build ``generator(key, n) -> (n, size, size)`` sampling the four
    families with proportions ``mix`` = (dead_leaves, gaussian_fields,
    phantoms, warps). With no ``seeds`` the warp share is folded into
    phantoms. Counts are deterministic per call (static shapes under
    jit); shuffling interleaves the families."""
    mix = list(mix)
    if seeds is None:
        mix = [mix[0], mix[1], mix[2] + mix[3], 0.0]
    tot = sum(mix)
    mix = [m / tot for m in mix]

    def generator(key, n: int) -> jnp.ndarray:
        n_dl = int(round(n * mix[0]))
        n_gf = int(round(n * mix[1]))
        n_wp = int(round(n * mix[3]))
        n_ph = n - n_dl - n_gf - n_wp
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        parts = []
        if n_dl:
            parts.append(dead_leaves(k1, n_dl, size, n_disks=n_disks))
        if n_gf:
            parts.append(gaussian_fields(k2, n_gf, size))
        if n_ph:
            parts.append(mri_phantoms(k3, n_ph, size))
        if n_wp:
            parts.append(elastic_warps(k4, seeds, n_wp, size))
        imgs = jnp.concatenate(parts, axis=0)
        return jax.random.permutation(k5, imgs, axis=0)

    return generator


def load_warp_seeds(include_photos: bool = True,
                    side: int = 256) -> Optional[jnp.ndarray]:
    """Leakage-free warp seed images as a (K, side, side) device array —
    or None if unavailable.

    The two non-testset MRI slices used by ``train.corpus`` (s1045 +
    brainslice) plus (default) all the other locally-available clean
    sample photos — elastic warps of real images put real-image
    statistics into the otherwise purely procedural stream. Each seed is
    center-cropped square and bilinearly resized to ``side``.
    """
    import numpy as np

    from pnp_admm_cnc_mri_tpu.train import corpus

    imgs = corpus.local_sample_images()
    names = [n for n in ("s1045_mri", "brainslice") if n in imgs]
    if include_photos:
        names += [n for n in sorted(imgs) if n not in names]
    if not names:
        return None
    seeds = []
    for n in names:
        im = np.asarray(imgs[n], np.float32)
        h, w = im.shape[:2]
        s = min(h, w)
        im = im[(h - s) // 2:(h - s) // 2 + s, (w - s) // 2:(w - s) // 2 + s]
        # resize on HOST (numpy bilinear) — a jax.image.resize here would
        # ship the raw image over the axon link, which stalls on MB-scale
        # transfers
        yi = np.linspace(0, s - 1, side)
        xi = np.linspace(0, s - 1, side)
        y0 = np.clip(yi.astype(int), 0, s - 2)
        x0 = np.clip(xi.astype(int), 0, s - 2)
        wy = (yi - y0)[:, None]
        wx = (xi - x0)[None, :]
        a = im[np.ix_(y0, x0)]
        b = im[np.ix_(y0, x0 + 1)]
        c = im[np.ix_(y0 + 1, x0)]
        d = im[np.ix_(y0 + 1, x0 + 1)]
        seeds.append((a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
                      + c * wy * (1 - wx) + d * wy * wx).astype(np.float32))
    stack = np.stack(seeds)
    # chunked host->device staging (axon: MB-scale single transfers stall)
    from pnp_admm_cnc_mri_tpu.train.trainer import stage_to_device

    return stage_to_device(stack)
