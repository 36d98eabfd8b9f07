"""Training data pipeline for denoiser training.

The reference has NO training (its weights come from KAIR,
``model_zoo/README.md``) — this subsystem is a new capability: train the
DnCNN/FDnCNN/FFDNet/DRUNet denoisers on TPU so the PnP priors do not
depend on unavailable external checkpoints.

Patch sampling follows the standard Gaussian-denoiser recipe the KAIR
models were trained with: random crops, dihedral augmentation, AWGN at a
fixed or sampled noise level.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np


def extract_patches(
    imgs: Sequence[np.ndarray],
    patch: int = 40,
    stride: int = 20,
) -> np.ndarray:
    """Dense patch grid from a list of (H, W) float [0,1] images."""
    out = []
    for img in imgs:
        h, w = img.shape[:2]
        for i in range(0, h - patch + 1, stride):
            for j in range(0, w - patch + 1, stride):
                out.append(img[i : i + patch, j : j + patch])
    return np.stack(out).astype(np.float32)


def extract_patches_multiscale(
    imgs: Sequence[np.ndarray],
    patch: int = 40,
    stride: int = 20,
    scales: Sequence[float] = (1.0, 0.75, 0.5),
) -> np.ndarray:
    """Patches from several MATLAB-bicubic rescalings of each image.

    Small corpora (the 15-image testset) benefit from multi-scale
    extraction — structures appear at several receptive-field sizes. Uses
    ``ops.resize.imresize`` (the reference-compatible bicubic).
    """
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import resize

    pools = []
    for s in scales:
        if s == 1.0:
            scaled = list(imgs)
        else:
            scaled = [
                np.asarray(resize.imresize(jnp.asarray(im), s)).clip(0, 1)
                for im in imgs
            ]
        scaled = [im for im in scaled if min(im.shape[:2]) >= patch]
        if scaled:
            pools.append(extract_patches(scaled, patch, stride))
    if not pools:
        raise ValueError("no scale produced patches >= patch size")
    return np.concatenate(pools, axis=0)


def augment_batch(patches: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random dihedral augmentation per patch (8 modes)."""
    modes = rng.integers(0, 8, size=patches.shape[0])
    out = np.empty_like(patches)
    for m in range(8):
        sel = modes == m
        if not sel.any():
            continue
        p = patches[sel]
        k = m % 4
        p = np.rot90(p, k, axes=(1, 2))
        if m >= 4:
            p = p[:, ::-1, :]
        out[sel] = p
    return out


def batches(
    patches: np.ndarray,
    batch_size: int,
    sigma: float | tuple[float, float],
    seed: int = 0,
    epochs: Optional[int] = None,
    augment: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (noisy, clean, sigma_map) float32 batches, NHWC with C=1.

    ``sigma``: fixed level or (lo, hi) range sampled per patch — the range
    form trains blind/conditioned models (FDnCNN/FFDNet/DRUNet).
    Values on the [0,1] scale (sigma=15/255 matches dncnn_15 etc).
    """
    rng = np.random.default_rng(seed)
    n = patches.shape[0]
    if n < batch_size:
        raise ValueError(
            f"only {n} patches available for batch_size={batch_size}; "
            "use more/larger training images or a smaller batch"
        )
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            clean = patches[idx]
            if augment:
                clean = augment_batch(clean, rng)
            if isinstance(sigma, tuple):
                s = rng.uniform(sigma[0], sigma[1], size=(batch_size, 1, 1)).astype(
                    np.float32
                )
            else:
                s = np.full((batch_size, 1, 1), sigma, dtype=np.float32)
            noisy = clean + s * rng.standard_normal(clean.shape).astype(np.float32)
            yield (
                noisy[..., None],
                clean[..., None],
                s[..., None],
            )
        epoch += 1
