"""BM3D as a PnP prior: jittable denoiser callables for the ADMM loop.

Reproduces the reference usage (``【2】PNP_ADMM_L1_BM3D .py:127``,
``【5】PNP_ADMM_CNC_BM3D .py:133-136``): the z-update denoises with BM3D
using the white-noise PSD from ``get_experiment_noise('gw', 0.03, 0)``
(sigma = sqrt(0.03)). Unlike the reference — which crosses the Python->C
FFI boundary with a scalar-by-scalar result readback
(``bm3d_ctypes.py:231-240``) AND processes one image per call — this runs
fully on device inside the same jitted fixed-point loop as the rest of
the iteration, and batches are processed ``batch_chunk`` images at a time
with ``vmap`` (chunks sequenced by ``lax.map`` to bound the peak memory
of the block-matching fields).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.priors.bm3d import core


def default_batch_chunk() -> int:
    """How many images to denoise concurrently (vmapped) per map step.

    MEASURED (scripts/bm3d_batch_probe.py, v5e, 256^2, 5-iter PnP): the
    vmapped batch path runs ~26-27 image-iters/s at every chunk in
    {4, 8} vs 40.4 for the sequential ``lax.map`` — per-image compute is
    ~1.9x SLOWER under vmap (XLA lowers the batched scatter/top-k chain
    worse than the sequential loop), far outweighing the ~24.5 ms
    dispatch amortization the batching was meant to buy. Sequential
    stays the default on every backend; pass ``batch_chunk`` explicitly
    to experiment. Full history in docs/PERF.md.
    """
    return 1


def _map_chunked(denoise_one: Callable, flat: jnp.ndarray,
                 chunk: int) -> jnp.ndarray:
    """Apply ``denoise_one`` ((H,W)->(H,W)) over the leading axis of
    ``flat`` (N,H,W), ``chunk`` images at a time via vmap; chunks are
    sequenced with ``lax.map`` so peak memory is bounded by one chunk."""
    n = flat.shape[0]
    chunk = max(1, min(int(chunk), n))
    if chunk == 1:
        return jax.lax.map(denoise_one, flat)
    if n == chunk:
        return jax.vmap(denoise_one)(flat)
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,) + flat.shape[1:],
                                                flat.dtype)], axis=0)
    blocks = flat.reshape((-1, chunk) + flat.shape[1:])
    out = jax.lax.map(jax.vmap(denoise_one), blocks)
    return out.reshape((-1,) + flat.shape[1:])[:n]


def make_bm3d_denoiser(
    noise_var: float = 0.03,
    profile: core.BM3DProfile = core.DEFAULT_PROFILE,
    stages: str = "all",
    batch_chunk: Optional[int] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build ``denoise(v, i)`` applying two-stage BM3D per image.

    ``noise_var`` follows the reference's ``get_experiment_noise('gw',
    0.03, ...)`` call — sigma = sqrt(var) on the [0,1] scale. Batched
    inputs are processed ``batch_chunk`` images at a time (vmap inside,
    ``lax.map`` across chunks; default :func:`default_batch_chunk`).
    """
    sigma = float(np.sqrt(noise_var))
    # The reference pipeline passes a full (white) PSD; end-to-end
    # calibration shows the C full-PSD path does NOT use the classic
    # high-sigma coarse-prefilter switch — keep raw-pixel matching here.
    prefilter = False
    if batch_chunk is None:
        batch_chunk = default_batch_chunk()

    def denoise_one(img):
        return core._bm3d_jit(img, jnp.asarray(sigma, img.dtype), profile, stages, prefilter)

    def denoise(v, i):
        if v.ndim == 2:
            return denoise_one(v)
        batch_shape = v.shape[:-2]
        flat = v.reshape((-1,) + v.shape[-2:])
        out = _map_chunked(denoise_one, flat, batch_chunk)
        return out.reshape(batch_shape + v.shape[-2:])

    return denoise


def make_bm3d_ladder_denoiser(
    sigmas,
    profile: core.BM3DProfile = core.DEFAULT_PROFILE,
    stages: str = "all",
    batch_chunk: Optional[int] = None,
) -> Callable[[jnp.ndarray, int], jnp.ndarray]:
    """Build ``denoise(v, i)`` with a per-iteration sigma ladder.

    ``sigmas`` is the [0,1]-scale array from ``schedules.get_rho_sigma``
    — the same ladder that conditions the CNN priors in the DPIR-style
    restoration pipelines (reference ``utils/utils_pnp.py:14-23``). Used
    by ``pnp_sr``/``pnp_deblur`` with ``--model bm3d`` (Python loop,
    concrete ``i``) and by the scanned MRI HQS solver
    (``solvers/hqs.run_hqs``, traced ``i`` — the sigma is gathered on
    device; ``core._bm3d_jit`` takes sigma as a runtime value). Batched
    inputs chunk exactly like :func:`make_bm3d_denoiser`.
    """
    sig = np.asarray(sigmas, np.float64)
    if batch_chunk is None:
        batch_chunk = default_batch_chunk()

    def denoise(v, i):
        if isinstance(i, (int, np.integer)):
            s = jnp.asarray(float(sig[int(i)]))
        else:  # traced scan counter: gather the sigma on device
            s = jnp.asarray(sig)[i]

        def denoise_one(img):
            return core._bm3d_jit(
                img, s.astype(img.dtype), profile, stages, False
            )

        if v.ndim == 2:
            return denoise_one(v)
        batch_shape = v.shape[:-2]
        flat = v.reshape((-1,) + v.shape[-2:])
        out = _map_chunked(denoise_one, flat, batch_chunk)
        return out.reshape(batch_shape + v.shape[-2:])

    return denoise
