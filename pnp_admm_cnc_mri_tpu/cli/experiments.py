"""Batched experiment runner reproducing the six reference entry scripts.

Each reference script (``【1】ADMM_L1.py`` ... ``【6】PNP_ADMM_CNC_D .py``)
loads masks + the fixed noise, loops over a testset one image at a time,
runs 50 ADMM iterations, and logs PSNR/SSIM/RE per image plus averages.
Here the whole testset solves as ONE batched jitted program; metrics are
computed on device and logged in the reference's format.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import numpy as np

from pnp_admm_cnc_mri_tpu.config import (
    ADMM_CNC_DEFAULT,
    ADMM_L1_DEFAULT,
    ADMMConfig,
)
from pnp_admm_cnc_mri_tpu.data import images, masks, noise
from pnp_admm_cnc_mri_tpu.ops import metrics as metrics_mod
from pnp_admm_cnc_mri_tpu.utils import logger as logger_mod


def prepare_batch(
    testset_dir: str,
    mask_name: str = "Q_Random30",
    data_dir: Optional[str] = None,
    use_clip: bool = True,
    only: Optional[str] = None,
):
    """Load testset + mask + noise and synthesize observations.

    Returns dict with imgs01 (B,H,W) f64, truth (B,H,W) f64 on the 0-255
    scale, y (B,H,W) complex128, mask (H,W), names.

    ``only`` (comma-separated image stems, e.g. ``"05,11"``) restricts the
    batch to those images — per-image sweeps pay for 1-2 images instead
    of the full set. Each image's observation is IDENTICAL to its slot in
    the full-set batch (same mask, same fixed noise realization), so
    filtered per-image PSNRs match full-set per_image_psnr values.
    """
    imgs01, truth, names = images.load_testset(testset_dir, use_clip=use_clip)
    mask = masks.load_mask(mask_name, data_dir)
    kn = noise.load_noise(data_dir)
    y = np.fft.fft2(imgs01, axes=(-2, -1)) * mask + kn
    if only:
        _, kept = _filter_only(imgs01, names, only)
        idx = [i for i, n in enumerate(names) if n in kept]
        imgs01, truth, y = imgs01[idx], truth[idx], y[idx]
        names = kept
    return {"imgs01": imgs01, "truth": truth, "y": y, "mask": mask, "names": names}


def _filter_only(imgs01, names, only: Optional[str]):
    """Apply the ``only`` image filter (comma-separated stems)."""
    if not only:
        return imgs01, names
    want = [w.strip() for w in only.split(",")]
    missing = [w for w in want if w not in names]
    if missing:
        raise ValueError(f"--images {missing} not in testset {sorted(names)}")
    idx = [i for i, n in enumerate(names) if n in want]
    return imgs01[idx], [names[i] for i in idx]


def score_and_log(
    x: np.ndarray,
    truth: np.ndarray,
    names,
    result_name: str,
    results_dir: str = "results",
    save_images: bool = True,
    round_uint8: bool = False,
    log=None,
) -> Dict[str, float]:
    """Per-image + average PSNR/SSIM/RE in the reference's log format.

    ``round_uint8`` mirrors ``【6】:315`` which rounds to uint8 before
    scoring (the other scripts score the float x*255 directly).
    """
    import jax.numpy as jnp

    e_path = os.path.join(results_dir, result_name)
    if log is None:
        log = logger_mod.logger_info(result_name, os.path.join(e_path, result_name + ".log"))

    img_e = np.asarray(x) * 255.0
    if round_uint8:
        img_e = np.float64(np.uint8(img_e.round().clip(0, 255)))

    # cast on the HOST to the reconstruction dtype: shipping float64 to the
    # axon TPU triggers an UNIMPLEMENTED device-side convert (f64 golden
    # runs execute on CPU where the f64 metric path is preserved)
    mdt = np.float64 if np.asarray(x).dtype == np.float64 else np.float32
    img_j = jnp.asarray(img_e.astype(mdt))
    truth_j = jnp.asarray(np.asarray(truth).astype(mdt))
    psnr = np.asarray(metrics_mod.psnr(img_j, truth_j))
    ssim = np.asarray(metrics_mod.ssim(img_j, truth_j))
    re = np.asarray(metrics_mod.relative_error(img_j, truth_j))

    for i, name in enumerate(names):
        log.info(
            "{:s} - PSNR: {:.2f} dB; SSIM: {:.4f} ; RE: {:.4f}.".format(
                name + ".png", psnr[i], ssim[i], re[i]
            )
        )
        if save_images:
            images.imsave(img_e[i], os.path.join(e_path, f"{name}_{result_name}.png"))
    avg = {
        "psnr": float(psnr.mean()),
        "ssim": float(ssim.mean()),
        "re": float(re.mean()),
        # per-image values ride the JSON so fold-exclusion protocols can
        # compose a testset score from several models' held-out images
        # without re-parsing the .log
        "per_image_psnr": {n: float(p) for n, p in zip(names, psnr)},
    }
    log.info(
        "------> Average PSNR:({:.3f})dB, Average ssim : ({:.3f}), Average re : ({:.3f})".format(
            avg["psnr"], avg["ssim"], avg["re"]
        )
    )
    return avg


def _device_complex(arr: np.ndarray, cdtype, dtype):
    """Put a host complex array on device, axon-safely.

    complex host->device transfers are UNIMPLEMENTED on the axon TPU
    backend (and device-side complex128->complex64 converts likewise):
    cast on the host, and on non-CPU backends ship the real/imag planes
    as two real arrays recombined in a one-op jit.
    """
    import jax
    import jax.numpy as jnp

    host = np.asarray(arr).astype(np.dtype(cdtype))
    if jax.devices()[0].platform == "cpu":
        return jnp.asarray(host)
    re = jnp.asarray(np.real(host).astype(np.dtype(dtype)))
    im = jnp.asarray(np.imag(host).astype(np.dtype(dtype)))
    return jax.jit(lambda a, b: (a + 1j * b).astype(cdtype))(re, im)


def run_classical(
    algo: str = "admm_l1",
    testset: str = "set1",
    mask_name: str = "Q_Random30",
    cfg: Optional[ADMMConfig] = None,
    testsets_dir: Optional[str] = None,
    data_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    dtype=None,
) -> Dict[str, float]:
    """Run ADMM-L1 or ADMM-CNC over a testset, batched (reference 【1】/【4】)."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.solvers import admm

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    batch = prepare_batch(os.path.join(testsets_dir, testset), mask_name,
                          data_dir, only=only)
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    if cfg is None:
        cfg = ADMM_L1_DEFAULT if algo == "admm_l1" else ADMM_CNC_DEFAULT
    solver = {"admm_l1": admm.admm_l1, "admm_cnc": admm.admm_cnc}[algo]

    y = _device_complex(batch["y"], cdtype, dtype)
    mask = jnp.asarray(np.asarray(batch["mask"]).astype(np.dtype(dtype)))

    t0 = time.perf_counter()
    final, _ = solver(y, mask, cfg, dtype=dtype)
    x = np.asarray(jax.block_until_ready(final.x))
    dt = time.perf_counter() - t0

    result_name = f"{testset}_dn_{algo.upper()}_{mask_name}"
    avg = score_and_log(
        x, batch["truth"], batch["names"], result_name, results_dir, save_images
    )
    avg["wall_s"] = dt
    avg["images"] = len(batch["names"])
    avg["iters"] = cfg.iter_num
    return avg


def run_pnp(
    denoise: Callable,
    cfg: ADMMConfig,
    scheme: str = "l1",
    testset: str = "set1",
    mask_name: str = "Q_Random30",
    denoise2: Optional[Callable] = None,
    clamp: bool = True,
    testsets_dir: Optional[str] = None,
    data_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    round_uint8: bool = False,
    result_tag: str = "pnp",
    dtype=None,
) -> Dict[str, float]:
    """Run a PnP variant with an arbitrary denoiser callable (refs 【2】/【3】/【5】/【6】)."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.solvers import admm

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    batch = prepare_batch(os.path.join(testsets_dir, testset), mask_name,
                          data_dir, only=only)
    if dtype is None:
        dtype = jnp.float32
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    y = _device_complex(batch["y"], cdtype, dtype)
    mask = jnp.asarray(np.asarray(batch["mask"]).astype(np.dtype(dtype)))

    t0 = time.perf_counter()
    if scheme == "l1":
        final, _ = admm.pnp_admm_l1(y, mask, cfg, denoise, clamp=clamp, dtype=dtype)
    else:
        final, _ = admm.pnp_admm_cnc(
            y, mask, cfg, denoise, denoise2, clamp=clamp, dtype=dtype
        )
    x = np.asarray(jax.block_until_ready(final.x))
    dt = time.perf_counter() - t0

    result_name = f"{testset}_dn_{result_tag}_{mask_name}"
    avg = score_and_log(
        x, batch["truth"], batch["names"], result_name, results_dir,
        save_images, round_uint8,
    )
    avg["wall_s"] = dt
    avg["images"] = len(batch["names"])
    avg["iters"] = cfg.iter_num
    return avg


def run_fista_l1(
    testset: str = "set1",
    mask_name: str = "Q_Random30",
    iter_num: int = 50,
    lam: float = 1e-4,
    step: float = 1.0,
    testsets_dir: Optional[str] = None,
    data_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    dtype=None,
    momentum: bool = True,
    result_tag: Optional[str] = None,
) -> Dict[str, float]:
    """FISTA-L1 (or, with ``momentum=False``, the reference's deleted
    PGD-L1 / "PGD soft" pipeline, anchor
    ``/root/reference/results/Set_dn_PGD_L1/Set_dn_PGD_L1.log``) over a
    testset (``solvers/fista.py``)."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.solvers import fista

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    batch = prepare_batch(os.path.join(testsets_dir, testset), mask_name,
                          data_dir, only=only)
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    y = _device_complex(batch["y"], cdtype, dtype)
    mask = jnp.asarray(np.asarray(batch["mask"]).astype(np.dtype(dtype)))

    t0 = time.perf_counter()
    final, _ = fista.fista_l1(y, mask, iter_num=iter_num, lam=lam, step=step,
                              momentum=momentum, dtype=dtype)
    x = np.asarray(jax.block_until_ready(final.x))
    dt = time.perf_counter() - t0

    tag = result_tag or ("FISTA_L1" if momentum else "PGD_L1")
    avg = score_and_log(
        x, batch["truth"], batch["names"],
        f"{testset}_dn_{tag}_{mask_name}", results_dir, save_images,
    )
    avg.update(wall_s=dt, images=len(batch["names"]), iters=iter_num)
    return avg


def run_pnp_fista(
    denoise: Callable,
    iter_num: int,
    step: float = 1.0,
    clamp: bool = True,
    testset: str = "set1",
    mask_name: str = "Q_Random30",
    testsets_dir: Optional[str] = None,
    data_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    result_tag: str = "pnp_fista",
    dtype=None,
    momentum: bool = True,
) -> Dict[str, float]:
    """PnP-FISTA (denoiser prox, ``solvers/fista.pnp_fista``) over a
    testset. With the clean weights this is the framework's best
    single-mask pipeline (drunet 31.50 dB set1 — TUNED_FISTA_D).
    ``momentum=False`` is the reference's deleted PNP-PGD pipeline
    (``results/Set1_dn_PNP_PGD_L1_BM3D/…log``)."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.solvers import fista

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    batch = prepare_batch(os.path.join(testsets_dir, testset), mask_name,
                          data_dir, only=only)
    if dtype is None:
        dtype = jnp.float32
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    y = _device_complex(batch["y"], cdtype, dtype)
    mask = jnp.asarray(np.asarray(batch["mask"]).astype(np.dtype(dtype)))

    t0 = time.perf_counter()
    final, _ = fista.pnp_fista(y, mask, iter_num, denoise, step=step,
                               clamp=clamp, dtype=dtype, momentum=momentum)
    x = np.asarray(jax.block_until_ready(final.x))
    dt = time.perf_counter() - t0

    avg = score_and_log(
        x, batch["truth"], batch["names"],
        f"{testset}_dn_{result_tag}_{mask_name}", results_dir, save_images,
    )
    avg.update(wall_s=dt, images=len(batch["names"]), iters=iter_num)
    return avg


def run_pnp_pgd_cnc(
    denoise: Callable,
    iter_num: int,
    denoise2: Optional[Callable] = None,
    alpha: float = 1.2,
    lam: float = 0.02,
    b: float = 36.0,
    step: float = 1.0,
    clamp: bool = True,
    testset: str = "set1",
    mask_name: str = "Q_Random30",
    testsets_dir: Optional[str] = None,
    data_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    result_tag: str = "pnp_pgd_cnc",
    dtype=None,
) -> Dict[str, float]:
    """PGD with the CNC double-denoiser prox (``solvers/fista.pnp_pgd_cnc``)
    — the reference's deleted PNP_PGD_CNC_* pipelines, evidenced by
    ``results/Set1_dnPGD soft/11_PNP_PGD_CNC_BM3D.png`` and
    ``results/Set_dn_fdncnn_gray/01PNP_PGD_CNC_D.png``."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.solvers import fista

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    batch = prepare_batch(os.path.join(testsets_dir, testset), mask_name,
                          data_dir, only=only)
    if dtype is None:
        dtype = jnp.float32
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    y = _device_complex(batch["y"], cdtype, dtype)
    mask = jnp.asarray(np.asarray(batch["mask"]).astype(np.dtype(dtype)))

    t0 = time.perf_counter()
    final, _ = fista.pnp_pgd_cnc(
        y, mask, iter_num, denoise, denoise2=denoise2, alpha=alpha,
        lam=lam, b=b, step=step, clamp=clamp, dtype=dtype)
    x = np.asarray(jax.block_until_ready(final.x))
    dt = time.perf_counter() - t0

    avg = score_and_log(
        x, batch["truth"], batch["names"],
        f"{testset}_dn_{result_tag}_{mask_name}", results_dir, save_images,
    )
    avg.update(wall_s=dt, images=len(batch["names"]), iters=iter_num)
    return avg


def run_pnp_hqs(
    denoise: Callable,
    iter_num: int,
    sigma255: float = 10.0,
    model_sigma1: float = 49.0,
    model_sigma2: float = 15.0,
    clamp: bool = True,
    testset: str = "set1",
    mask_name: str = "Q_Random30",
    testsets_dir: Optional[str] = None,
    data_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    result_tag: str = "pnp_hqs",
    dtype=None,
) -> Dict[str, float]:
    """PnP-HQS (``solvers/hqs.pnp_hqs``) over a testset — the DPIR
    iteration on the MRI problem, the third MRI solver family beside
    ADMM and FISTA. The ladder ``(iter_num, model_sigma1, model_sigma2)``
    must match the denoiser's (``TUNED_HQS_D`` keeps them coupled)."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.solvers import hqs

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    batch = prepare_batch(os.path.join(testsets_dir, testset), mask_name,
                          data_dir, only=only)
    if dtype is None:
        dtype = jnp.float32
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    y = _device_complex(batch["y"], cdtype, dtype)
    mask = jnp.asarray(np.asarray(batch["mask"]).astype(np.dtype(dtype)))

    t0 = time.perf_counter()
    z, _ = hqs.pnp_hqs(y, mask, iter_num, denoise, sigma255=sigma255,
                       model_sigma1=model_sigma1, model_sigma2=model_sigma2,
                       clamp=clamp, dtype=dtype)
    x = np.asarray(jax.block_until_ready(z))
    dt = time.perf_counter() - t0

    avg = score_and_log(
        x, batch["truth"], batch["names"],
        f"{testset}_dn_{result_tag}_{mask_name}", results_dir, save_images,
    )
    avg.update(wall_s=dt, images=len(batch["names"]), iters=iter_num)
    return avg


def run_red(
    denoise: Callable,
    iter_num: int,
    lam: float = 0.2,
    step: float = 1.0,
    variant: str = "fp",
    clamp: bool = True,
    testset: str = "set1",
    mask_name: str = "Q_Random30",
    testsets_dir: Optional[str] = None,
    data_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    result_tag: str = "red",
    dtype=None,
) -> Dict[str, float]:
    """RED (regularization by denoising, ``solvers/red.run_red``) over a
    testset — the fourth MRI solver family (explicit denoiser-built
    regularizer; Romano-Elad-Milanfar 2017)."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.solvers import red

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    batch = prepare_batch(os.path.join(testsets_dir, testset), mask_name,
                          data_dir, only=only)
    if dtype is None:
        dtype = jnp.float32
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    y = _device_complex(batch["y"], cdtype, dtype)
    mask = jnp.asarray(np.asarray(batch["mask"]).astype(np.dtype(dtype)))

    t0 = time.perf_counter()
    x, _ = red.run_red(y, mask, iter_num, denoise, lam=lam, step=step,
                       variant=variant, clamp=clamp, dtype=dtype)
    x = np.asarray(jax.block_until_ready(x))
    dt = time.perf_counter() - t0

    avg = score_and_log(
        x, batch["truth"], batch["names"],
        f"{testset}_dn_{result_tag}_{mask_name}", results_dir, save_images,
    )
    avg.update(wall_s=dt, images=len(batch["names"]), iters=iter_num)
    return avg


def _restoration_prior(
    model_name, iter_num, eff_nlm, sigmas, weights, x8, model_sigma1, bf16,
    clean=False,
):
    """Denoiser prior for the DPIR-style restoration pipelines
    (``run_sr``/``run_deblur``): a model-zoo CNN, or ladder-driven BM3D
    when ``model_name == 'bm3d'`` (the iterative counterpart of the
    one-shot ``priors.bm3d.api.bm3d_deblurring``)."""
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.priors import denoiser as denoiser_mod

    if model_name == "bm3d":
        from pnp_admm_cnc_mri_tpu.priors import bm3d_prior

        ignored = [name for name, v in
                   (("--weights", weights), ("--x8", x8), ("--bf16", bf16))
                   if v]
        if ignored:
            import warnings

            warnings.warn(
                f"--model bm3d ignores {', '.join(ignored)} (CNN-only knobs)",
                stacklevel=2,
            )
        return bm3d_prior.make_bm3d_ladder_denoiser(sigmas)
    extra = {}
    if model_sigma1 is not None:
        extra["model_sigma1"] = model_sigma1
    return denoiser_mod.build_denoiser(
        model_name, iter_num=iter_num,
        weights=denoiser_mod.resolve_weights(model_name, weights, clean=clean),
        noise_level_model=denoiser_mod.nlm_for_model(model_name, eff_nlm),
        x8=x8, compute_dtype=jnp.bfloat16 if bf16 else None, **extra,
    )


from pnp_admm_cnc_mri_tpu.config import DEBLUR_KERNELS  # noqa: E402 (re-export)


def make_blur_kernel(kernel: str = "aniso"):
    """Named blur kernels for the deblurring pipeline (host NumPy).

    'aniso' — anisotropic Gaussian (reference ``utils_sisr.py:692-711``
    tooling), 'gauss' — isotropic Gaussian via ``gm_blur_kernel``
    (``utils_sisr.py:714-724``), 'box' — 9x9 uniform motion-free box blur.
    """
    import numpy as _np

    from pnp_admm_cnc_mri_tpu.ops import sisr

    if kernel == "aniso":
        return sisr.anisotropic_gaussian(ksize=15, theta=0.25 * _np.pi, l1=3.0, l2=1.0)
    if kernel == "gauss":
        return sisr.gm_blur_kernel(mean=[0.0, 0.0], cov=[[2.0, 0.0], [0.0, 2.0]], size=15)
    if kernel == "box":
        return _np.full((9, 9), 1.0 / 81.0)
    raise ValueError(f"unknown blur kernel '{kernel}' (want one of {DEBLUR_KERNELS})")


def run_deblur(
    model_name: str = "drunet_gray",
    kernel: str = "aniso",
    iter_num: int = 8,
    nlm: Optional[float] = None,
    noise_sigma255: float = 2.55,
    testset: str = "set1",
    testsets_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    weights: Optional[str] = None,
    seed: int = 0,
    x8: bool = False,
    model_sigma1: Optional[float] = None,
    bf16: bool = False,
    clean: bool = False,
) -> Dict[str, float]:
    """PnP non-blind deblurring over a testset (new capability; the sf=1
    sibling of :func:`run_sr`, completing the DPIR degradation family the
    reference vendors unused in ``utils/utils_sisr.py``).

    Degradation: circular blur (``ops/sisr.wrap_convolve``) + Gaussian
    noise. Solver: DPIR-style HQS alternating the diagonal frequency-domain
    data solve (``ops/sisr.deblur_solution``) with a model-zoo denoiser,
    both driven by one ``get_rho_sigma`` ladder (``utils/utils_pnp.py:14``).
    The whole testset reconstructs as one batched program.
    """
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import schedules, sisr

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    imgs01, _, names = images.load_testset(os.path.join(testsets_dir, testset))
    imgs01, names = _filter_only(imgs01, names, only)
    h, w = imgs01.shape[-2:]
    imgs01 = imgs01[..., : h - h % 8, : w - w % 8]
    x_true = jnp.asarray(imgs01, jnp.float32)
    truth255 = np.asarray(imgs01) * 255.0

    k = jnp.asarray(make_blur_kernel(kernel), jnp.float32)
    y = sisr.wrap_convolve(x_true, k)
    y = y + (noise_sigma255 / 255.0) * jax.random.normal(
        jax.random.PRNGKey(seed), y.shape, y.dtype)

    eff_nlm = float(max(1.0, noise_sigma255)) if nlm is None else float(nlm)
    _fb, _fbc, f2b, fbfy = sisr.pre_calculate(y, k, 1)
    rhos, sigmas = schedules.get_rho_sigma(
        sigma=max(noise_sigma255, 0.1) / 255.0, iter_num=iter_num,
        model_sigma1=model_sigma1 if model_sigma1 is not None else 49.0,
        model_sigma2=eff_nlm)
    denoise = _restoration_prior(
        model_name, iter_num, eff_nlm, sigmas, weights, x8, model_sigma1, bf16,
        clean=clean)

    t0 = time.perf_counter()
    z = y
    for i in range(iter_num):
        x = sisr.deblur_solution(z, f2b, fbfy, float(rhos[i]))
        z = jnp.clip(denoise(x, i), 0.0, 1.0)
    z = np.asarray(jax.block_until_ready(z))
    dt = time.perf_counter() - t0

    result_name = f"{testset}_deblur_{kernel}_{model_name}"
    avg = score_and_log(z, truth255, names, result_name, results_dir, save_images)
    avg["wall_s"] = dt
    avg["images"] = len(names)
    avg["iters"] = iter_num
    return avg


def run_sr(
    model_name: str = "drunet_gray",
    sf: int = 2,
    iter_num: int = 8,
    nlm: Optional[float] = None,
    noise_sigma255: float = 1.5,
    testset: str = "set1",
    testsets_dir: Optional[str] = None,
    results_dir: str = "results",
    save_images: bool = True,
    only: Optional[str] = None,
    weights: Optional[str] = None,
    seed: int = 0,
    x8: bool = False,
    model_sigma1: Optional[float] = None,
    bf16: bool = False,
    clean: bool = False,
) -> Dict[str, float]:
    """PnP super-resolution over a testset (new capability; the reference
    vendors ``utils/utils_sisr.py`` unused — it cannot run on modern torch).

    DPIR-style HQS: anisotropic-Gaussian blur + ``sf``-fold decimation +
    Gaussian noise as the degradation, then alternate the closed-form
    frequency-domain data solution (``ops/sisr.data_solution``) with a
    model-zoo denoiser, both driven by ONE ``get_rho_sigma`` ladder
    (``utils/utils_pnp.py:14-23``; modelSigma2 = max(sf, noise*255)).
    The whole testset reconstructs as one batched program.
    """
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import schedules, sisr

    testsets_dir = testsets_dir or images.DEFAULT_TESTSETS
    imgs01, _, names = images.load_testset(os.path.join(testsets_dir, testset))
    imgs01, names = _filter_only(imgs01, names, only)
    # modcrop to sf*8 so decimation and the denoiser pads stay aligned
    m = sf * 8
    h, w = imgs01.shape[-2:]
    imgs01 = imgs01[..., : h - h % m, : w - w % m]
    x_true = jnp.asarray(imgs01, jnp.float32)
    truth255 = np.asarray(imgs01) * 255.0

    k = jnp.asarray(sisr.anisotropic_gaussian(ksize=9, theta=0.7, l1=2.5, l2=1.0),
                    jnp.float32)
    y = sisr.classical_degradation(x_true, k, sf)
    y = y + (noise_sigma255 / 255.0) * jax.random.normal(
        jax.random.PRNGKey(seed), y.shape, y.dtype)

    x0 = jnp.kron(y, jnp.ones((sf, sf), y.dtype))
    eff_nlm = float(max(sf, noise_sigma255)) if nlm is None else float(nlm)
    fb, fbc, f2b, fbfy = sisr.pre_calculate(y, k, sf)
    # Floor sigma like run_deblur: noise_sigma255=0 (noiseless SR) would
    # yield rhos == 0 and a divide-by-zero in data_solution.
    rhos, sigmas = schedules.get_rho_sigma(
        sigma=max(noise_sigma255, 0.1) / 255.0, iter_num=iter_num,
        model_sigma1=model_sigma1 if model_sigma1 is not None else 49.0,
        model_sigma2=eff_nlm)
    denoise = _restoration_prior(
        model_name, iter_num, eff_nlm, sigmas, weights, x8, model_sigma1, bf16,
        clean=clean)

    t0 = time.perf_counter()
    z = x0
    for i in range(iter_num):
        x = sisr.data_solution(z, fb, fbc, f2b, fbfy, float(rhos[i]), sf)
        z = jnp.clip(denoise(x, i), 0.0, 1.0)
    z = np.asarray(jax.block_until_ready(z))
    dt = time.perf_counter() - t0

    result_name = f"{testset}_sr{sf}_{model_name}"
    avg = score_and_log(z, truth255, names, result_name, results_dir, save_images)
    avg["wall_s"] = dt
    avg["images"] = len(names)
    avg["iters"] = iter_num
    return avg
