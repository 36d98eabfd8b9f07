"""Denoiser-as-prior adapters: CNN z-updates inside the jitted ADMM loop.

Reproduces the semantics of the reference dispatchers ``denoising_step1``
(``【3】PNP_ADMM_L1_D  .py:19-68``) and ``denoising_step2``
(``【6】PNP_ADMM_CNC_D .py:18-67``) as pure jittable callables
``denoise(v, i)`` with v of shape (..., H, W) in [0,1]:

- ``dncnn_*``:  z = model(v)                      (residual net)
- ``fdncnn_gray``: concat the |k-space noise|/255 map channel (the
  reference feeds the noise *magnitude image*, not a constant level map —
  quirk at ``【3】:27-31``, replicated)
- ``drunet_gray``: concat the per-iteration sigma-ladder map; optional
  cycling dihedral augmentation (x8) by iteration index
- ``ircnn_gray``: 25-way stacked weights, gathered by the sigma-bin
  schedule on device (vs per-iteration state-dict reloads in the reference)
- ``ffdnet_gray``: model(v, noise_level/255)

All adapters fold leading batch axes, run the network NHWC, and restore
the batch shape — no host round trips anywhere.
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnp_admm_cnc_mri_tpu.models import convert
from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN, FDnCNN, IRCNN
from pnp_admm_cnc_mri_tpu.models.drunet import UNetRes
from pnp_admm_cnc_mri_tpu.models.ffdnet import FFDNet
from pnp_admm_cnc_mri_tpu.ops import schedules


# ---------------------------------------------------------------------------
# Dihedral transforms (reference ``utils_image.augment_img_tensor4:333-349``)
# ---------------------------------------------------------------------------


def _augment(x: jnp.ndarray, mode: int, axes=(-2, -1)) -> jnp.ndarray:
    """Dihedral augment over the (H, W) ``axes``; mode 0-7 as in the
    reference. Default trailing axes suit (..., H, W); NHWC uses (1, 2)."""
    rot = lambda k: jnp.rot90(x, k, axes=axes)
    flip_h = lambda a: jnp.flip(a, axis=axes[0])
    if mode == 0:
        return x
    if mode == 1:
        return flip_h(rot(1))
    if mode == 2:
        return flip_h(x)
    if mode == 3:
        return rot(3)
    if mode == 4:
        return flip_h(rot(2))
    if mode == 5:
        return rot(1)
    if mode == 6:
        return rot(2)
    return flip_h(rot(3))


def augment(x: jnp.ndarray, mode: jnp.ndarray, axes=(-2, -1)) -> jnp.ndarray:
    """Traced-mode dihedral augment via lax.switch.

    Square spatial dims only: all 8 branches must produce one static shape
    (rot90 transposes H/W). Non-square images can still use the eager
    ``x8_ensemble``; the per-iteration cycling path raises here with a
    clear message instead of an opaque switch shape error."""
    h, w = x.shape[axes[0]], x.shape[axes[1]]
    if h != w:
        raise ValueError(
            f"traced dihedral augmentation needs square spatial dims, got "
            f"{h}x{w}; pad to square or disable x8 cycling for this input"
        )
    return jax.lax.switch(
        mode, [functools.partial(_augment, mode=m, axes=axes) for m in range(8)], x
    )


INVERSE_MODE = np.array([0, 1, 2, 5, 4, 3, 6, 7], dtype=np.int32)
"""Inverse transform index: i except 3<->5 (reference ``test_x8`` /
``【3】:47-50`` uses ``8 - i`` for i in {3,5})."""


def x8_cycling(denoise_core: Callable, i: jnp.ndarray, v: jnp.ndarray,
               axes=(1, 2)) -> jnp.ndarray:
    """Per-iteration cycling augmentation: transform by i%8, denoise,
    inverse-transform (reference ``【3】:41,47-50`` — the DRUNet x8 path).
    ``axes`` defaults to NHWC spatial axes."""
    m = jnp.mod(i, 8).astype(jnp.int32)
    out = denoise_core(augment(v, m, axes))
    return augment(out, jnp.asarray(INVERSE_MODE)[m], axes)


def x8_ensemble(denoise_core: Callable, v: jnp.ndarray, axes=(1, 2)) -> jnp.ndarray:
    """Full 8-fold self-ensemble average (reference ``utils_model.test_x8``,
    mode 3 of ``test_mode``). ``axes`` defaults to NHWC spatial axes."""
    outs = [
        _augment(denoise_core(_augment(v, m, axes)), int(INVERSE_MODE[m]), axes)
        for m in range(8)
    ]
    return sum(outs) / 8.0


# ---------------------------------------------------------------------------
# Weight resolution
# ---------------------------------------------------------------------------

DEFAULT_MODEL_ZOO = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "model_zoo")
)


def nlm_for_model(model_name: str, nlm255: Optional[float]) -> Optional[float]:
    """Convert a noise level on the reference's [0,255] scale to
    ``build_denoiser``'s ``noise_level_model`` convention: [0,1] for the
    sigma-ladder models (ircnn/drunet), [0,255] for ffdnet/fdncnn.

    The single place this scale logic lives — used by the CLI, ``run_sr``
    and the examples so they cannot diverge."""
    if nlm255 is None:
        return None
    name = model_name.lower()
    if "ircnn" in name or "drunet" in name or "tdnet" in name:
        return nlm255 / 255.0
    return float(nlm255)


def resolve_weights(model_name: str, weights: Optional[str] = None,
                    model_zoo: Optional[str] = None,
                    clean: bool = False) -> Optional[str]:
    """Resolve a weights path for a model name.

    An explicit ``weights`` path wins; otherwise look for
    ``model_zoo/<model_name>.npz`` then ``.pth`` (the reference expects
    KAIR checkpoints in ``model_zoo/`` — ``【3】PNP_ADMM_L1_D  .py:102``).
    Returns None when nothing is found (callers may fall back to random
    init, which ``build_denoiser`` warns about).

    ``clean=True`` selects ``model_zoo/<model_name>_clean.npz`` — the
    LEAKAGE-FREE weights trained only on the clean corpus
    (``train/corpus.py``; zero overlap with the evaluation testsets).
    The unsuffixed weights were trained on the evaluation testset itself
    and score higher there; reference-comparison claims use the clean
    ones. Falls back to the unsuffixed file (with a warning) if the
    clean file is absent.
    """
    if weights is not None:
        return weights
    zoo = model_zoo or DEFAULT_MODEL_ZOO
    names = ([model_name + "_clean"] if clean else []) + [model_name]
    for name in names:
        for ext in (".npz", ".pth"):
            cand = os.path.join(zoo, name + ext)
            if os.path.exists(cand):
                if clean and name == model_name:
                    import warnings

                    warnings.warn(
                        f"no clean weights for {model_name}; falling back "
                        f"to the testset-trained {cand}", stacklevel=2)
                return cand
    return None


# ---------------------------------------------------------------------------
# Adapter construction
# ---------------------------------------------------------------------------


def _as_nhwc(v: jnp.ndarray, compute_dtype=None):
    """(..., H, W) -> (B, H, W, 1) plus a restore function.

    ``compute_dtype`` (e.g. bfloat16) casts the network input and casts the
    output back to v's dtype — the MXU-native low-precision conv path
    (measured quality-neutral for the PnP priors: +-0.04 dB)."""
    batch_shape = v.shape[:-2]
    h, w = v.shape[-2:]
    x = v.reshape((-1, h, w, 1))
    if compute_dtype is not None:
        out_dtype = v.dtype
        x = x.astype(compute_dtype)
        return x, lambda y: y[..., 0].astype(out_dtype).reshape(*batch_shape, h, w)
    return x, lambda y: y[..., 0].reshape(*batch_shape, h, w)


def build_denoiser(
    model_name: str,
    weights: Optional[str] = None,
    iter_num: int = 50,
    noise_level_model: Optional[float] = None,
    model_sigma1: float = 49.0,
    x8: Optional[bool] = None,
    noises: Optional[np.ndarray] = None,
    allow_random_init: bool = True,
    param_dtype=jnp.float32,
    nc: int = 64,
    nb: Optional[int] = None,
    params=None,
    compute_dtype=None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build a jittable ``denoise(v, i)`` for a reference model name.

    ``weights``: path to a KAIR ``.pth`` state-dict or a converted ``.npz``.
    With no weights and ``allow_random_init``, random-initialized parameters
    are used (functional pipeline; quality obviously not meaningful).
    ``noises``: the complex k-space noise field (for fdncnn's map channel).
    ``nc``/``nb`` override the architecture width/depth (tests, custom
    models); ``params`` injects an already-loaded pytree directly.
    ``compute_dtype=jnp.bfloat16`` runs the conv stack in bfloat16 (MXU
    fast path; quality-neutral for the PnP priors, measured +-0.04 dB).
    """
    name = model_name.lower()

    def _maybe_cast(tree):
        if compute_dtype is None or tree is None:
            return tree
        return jax.tree.map(lambda a: jnp.asarray(a, compute_dtype), tree)

    if "dncnn" in name and "fdncnn" not in name:
        if nb is None:
            nb = 20 if name in ("dncnn_gray_blind", "dncnn_color_blind", "dncnn3") else 17
        model = DnCNN(out_nc=1, nc=nc, nb=nb)
        if params is None:
            params = _load_params(model, weights, convert.convert_dncnn, nb=nb,
                                  allow_random=allow_random_init, dtype=param_dtype)

        params = _maybe_cast(params)

        def denoise(v, i):
            x, restore = _as_nhwc(v, compute_dtype)
            return restore(model.apply(params, x))

        return denoise

    if "fdncnn" in name:
        model = FDnCNN(out_nc=1, nc=nc, nb=nb or 20)
        if params is None:
            params = _load_params(model, weights, convert.convert_fdncnn, nb=nb or 20,
                                  allow_random=allow_random_init, dtype=param_dtype,
                                  in_nc=2)
        if noise_level_model is not None:
            # Constant sigma map (canonical FDnCNN conditioning; [0,255]
            # scale like ffdnet — matches how the self-trained weights are
            # conditioned), built from the input's own shape at call time.
            # Default (None) keeps the reference's quirk of feeding the
            # k-space noise MAGNITUDE IMAGE (``【3】:27-31``).
            noise_map = None
            nlm01 = noise_level_model / 255.0
        else:
            if noises is None:
                from pnp_admm_cnc_mri_tpu.data import noise as noise_mod

                noises = noise_mod.load_noise()
            noise_map = jnp.asarray(np.abs(noises) / 255.0,
                                    compute_dtype or param_dtype)
        params = _maybe_cast(params)

        def denoise(v, i):
            x, restore = _as_nhwc(v, compute_dtype)
            if noise_map is None:
                nm = jnp.full_like(x[..., :1], nlm01)
            else:
                nm = jnp.broadcast_to(
                    noise_map[None, :, :, None], x.shape
                ).astype(x.dtype)
            return restore(model.apply(params, jnp.concatenate([x, nm], axis=-1)))

        return denoise

    if "ircnn" in name:
        model = IRCNN(out_nc=1, nc=nc)
        nlm = 15.0 / 255.0 if noise_level_model is None else noise_level_model
        _, sigmas = schedules.get_rho_sigma(
            sigma=max(0.255 / 255.0, nlm), iter_num=iter_num,
            model_sigma1=model_sigma1, model_sigma2=nlm * 255.0,
        )
        idx = jnp.asarray(schedules.ircnn_sigma_indices(sigmas))
        stacked = params if params is not None else _load_ircnn_stack(
            model, weights, allow_random_init, param_dtype)
        # device-resident stack: numpy leaves cannot be gathered with a
        # traced per-iteration index
        stacked = jax.tree.map(
            lambda a: jnp.asarray(a, compute_dtype or param_dtype), stacked
        )

        def denoise(v, i):
            params_i = jax.tree.map(lambda a: a[idx[i]], stacked)
            x, restore = _as_nhwc(v, compute_dtype)
            return restore(model.apply(params_i, x))

        return denoise

    if "ffdnet" in name:
        model = FFDNet(out_nc=1, nc=nc, nb=nb or 15)
        nlm = 15.0 if noise_level_model is None else noise_level_model
        if params is None:
            params = _load_params(model, weights, convert.convert_ffdnet, nb=nb or 15,
                                  allow_random=allow_random_init, dtype=param_dtype,
                                  ffdnet=True)
        sig = jnp.asarray(nlm / 255.0, compute_dtype or param_dtype)
        params = _maybe_cast(params)

        def denoise(v, i):
            x, restore = _as_nhwc(v, compute_dtype)
            return restore(model.apply(params, x, sig))

        return denoise

    if "tdnet" in name:
        from pnp_admm_cnc_mri_tpu.models.tdnet import TDNet

        # TPU-shaped prior (models/tdnet.py): nc=128 MXU-filling width.
        # `nc` keeps its 64 default for the reference models; TDNet's own
        # default width applies unless explicitly overridden (tests).
        td_nc = nc if nc != 64 else 128
        model = TDNet(out_nc=1, nc=td_nc, nb=nb or 12)
        nlm = 15.0 / 255.0 if noise_level_model is None else noise_level_model
        _, sigmas = schedules.get_rho_sigma(
            sigma=max(0.255 / 255.0, nlm), iter_num=iter_num,
            model_sigma1=model_sigma1, model_sigma2=nlm * 255.0,
        )
        sigmas_d = jnp.asarray(sigmas, compute_dtype or param_dtype)
        if params is None:
            params = _load_params(model, weights, None,
                                  allow_random=allow_random_init,
                                  dtype=param_dtype, ffdnet=True)
        params = _maybe_cast(params)
        use_x8 = bool(x8) if x8 is not None else False

        def denoise(v, i):
            x, restore = _as_nhwc(v, compute_dtype)
            core = lambda xx: model.apply(params, xx, sigmas_d[i])
            if use_x8:
                return restore(x8_ensemble(core, x))
            return restore(core(x))

        return denoise

    if "drunet" in name:
        model = UNetRes(out_nc=1, nc=(nc, nc * 2, nc * 4, nc * 8), nb=nb or 4)
        nlm = 15.0 / 255.0 if noise_level_model is None else noise_level_model
        _, sigmas = schedules.get_rho_sigma(
            sigma=max(0.255 / 255.0, nlm), iter_num=iter_num,
            model_sigma1=model_sigma1, model_sigma2=nlm * 255.0,
        )
        sigmas_d = jnp.asarray(sigmas, compute_dtype or param_dtype)
        if params is None:
            params = _load_params(model, weights, convert.convert_drunet,
                                  allow_random=allow_random_init, dtype=param_dtype,
                                  in_nc=2)
        use_x8 = bool(x8) if x8 is not None else False
        params = _maybe_cast(params)

        def net(x2ch):
            return model.apply(params, x2ch)

        def core(x, i):
            # sigma map concatenated BEFORE tiling, then the reference's
            # mode-2 tiler (refield=32, min_size=256, modulo=16 — a plain
            # pad/forward at <=256x256, recursive quad-split above;
            # reference ``【3】:43-44``)
            from pnp_admm_cnc_mri_tpu.priors import tiling

            sm = jnp.full_like(x[..., :1], sigmas_d[i])
            x2 = jnp.concatenate([x, sm], axis=-1)
            return tiling.quad_split(net, x2, refield=32, min_size=256, modulo=16)

        def denoise(v, i):
            x, restore = _as_nhwc(v, compute_dtype)
            if use_x8:
                return restore(x8_cycling(lambda a: core(a, i), i, x))
            return restore(core(x, i))

        return denoise

    raise ValueError(f"unknown denoiser model: {model_name}")


def _check_shapes(model, params, in_nc, ffdnet, dtype, weights):
    """Fail early with a readable message if loaded weights do not match
    the model architecture (wrong nc/nb/checkpoint family)."""
    import jax

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, in_nc), dtype)
    expected = model.init(rng, dummy, jnp.asarray(0.1, dtype)) if ffdnet else model.init(rng, dummy)
    exp_shapes = jax.tree.map(lambda a: str(a.shape), expected)
    got_shapes = jax.tree.map(lambda a: str(np.asarray(a).shape), params)
    if exp_shapes != got_shapes:
        raise ValueError(
            f"weights {weights!r} do not match the model architecture "
            f"({model.__class__.__name__}); check --model / nc / nb. "
            f"First few expected vs loaded leaf shapes: "
            f"{jax.tree.leaves(exp_shapes)[:3]} vs {jax.tree.leaves(got_shapes)[:3]}"
        )
    return params


def _load_params(model, weights, converter, allow_random=True, dtype=jnp.float32,
                 in_nc=1, ffdnet=False, **kw):
    if weights is not None:
        if weights.endswith(".npz"):
            loaded = convert.load_npz(weights)
        else:
            sd = convert.load_state_dict(weights)
            loaded = converter(sd, **kw) if kw else converter(sd)
        return _check_shapes(model, loaded, in_nc, ffdnet, dtype, weights)
    if not allow_random:
        raise FileNotFoundError(f"weights required for {model.__class__.__name__}")
    warnings.warn(
        f"no weights given for {model.__class__.__name__}: using RANDOM "
        f"initialization — reconstruction quality will be meaningless. Pass "
        f"weights= or place <model>.npz in model_zoo/.",
        stacklevel=3,
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, in_nc), dtype)
    if ffdnet:
        return model.init(rng, dummy, jnp.asarray(0.1, dtype))
    return model.init(rng, dummy)


def _load_ircnn_stack(model, weights, allow_random, dtype):
    if weights is not None:
        if weights.endswith(".npz"):
            return convert.load_npz(weights)
        bundle = convert.load_state_dict(weights)
        return convert.convert_ircnn_bundle(bundle)
    if not allow_random:
        raise FileNotFoundError("ircnn weights required")
    warnings.warn(
        "no weights given for IRCNN: using RANDOM initialization — "
        "reconstruction quality will be meaningless.",
        stacklevel=3,
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 1), dtype)
    one = model.init(rng, dummy)
    return jax.tree.map(lambda a: jnp.stack([a] * 25), one)


def rescaled_denoiser(residual_denoise: Callable[[jnp.ndarray], jnp.ndarray],
                      sigma: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Min-max rescaling wrapper around a residual denoiser.

    Reference ``utils/utils.py:20-47`` (``Denoisingstep``, the
    Provable-PnP-style wrapper): normalize the iterate to [0,1], apply the
    sigma-dependent scale ``1 + sigma/255/2`` (denoisers are trained on
    "normalized image + noise"), subtract the predicted residual, and undo
    the scaling. ``residual_denoise(x)`` returns the NOISE estimate (like
    the raw DnCNN trunk), per the reference's ``x = xtilde - r``.
    """
    scale_range = 1.0 + sigma / 255.0 / 2.0
    scale_shift = (1.0 - scale_range) / 2.0

    def denoise(x: jnp.ndarray) -> jnp.ndarray:
        mn = jnp.min(x, axis=(-2, -1), keepdims=True)
        mx = jnp.max(x, axis=(-2, -1), keepdims=True)
        rng_ = jnp.where(mx > mn, mx - mn, 1.0)  # constant image -> identity
        xt = (x - mn) / rng_
        xt = xt * scale_range + scale_shift
        r = residual_denoise(xt)
        out = xt - r
        out = (out - scale_shift) / scale_range
        return out * rng_ + mn

    return denoise
