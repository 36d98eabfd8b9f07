"""Weight conversion: KAIR/DPIR torch checkpoints -> Flax param pytrees.

The reference loads ``model_zoo/<name>.pth`` torch state-dicts (reference
``【3】PNP_ADMM_L1_D  .py:133,171``; weights come from KAIR, not the repo,
``model_zoo/README.md``). This module maps those state-dicts onto the NHWC
Flax modules in this package:

- Conv2d weight OIHW -> HWIO transpose.
- ConvTranspose2d weight (I, O, kH, kW) -> (kH, kW, O, I) for Flax
  ``ConvTranspose(transpose_kernel=True)`` (verified numerically in
  tests/test_models.py).
- IRCNN's 25-way bundle {"0".."24"} -> one stacked pytree with leading
  axis 25, gathered per iteration on device.

Layout notes (torch Sequential key indices):
- DnCNN/FDnCNN (act 'R'): keys ``model.{2i}.weight`` — convs at even
  indices, ReLUs odd; head=0, body i=2(i+1), tail=2(nb-1).
- IRCNN: 7 convs at ``model.{0,2,...,12}``.
- FFDNet: convs under ``model.{2i}`` between pixel un/shuffle wrappers.
- DRUNet: ``m_head|m_tail.weight``; ``m_down{k}.{i}.res.{0,2}.weight``
  ResBlocks for i<nb and ``m_down{k}.{nb}.weight`` the downsampler;
  ``m_up{k}.0.weight`` the transposed conv, then ResBlocks at 1..nb;
  ``m_body.{i}.res.{0,2}.weight``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    # torch tensor or ndarray -> ndarray (no torch import needed for npz)
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def convt_w(t) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kH,kW) -> flax (kH,kW,O,I) for
    transpose_kernel=True."""
    return _np(t).transpose(2, 3, 1, 0)


def load_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth (torch, weights_only) or .npz checkpoint as a flat dict."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return obj


def _seq_conv_params(sd: Dict[str, Any], nb: int, prefix: str = "model") -> Dict[str, Any]:
    """Shared DnCNN/FDnCNN/FFDNet trunk: nb convs at even Sequential slots."""
    params: Dict[str, Any] = {}

    def entry(i):
        return {
            "conv": {
                "kernel": conv_w(sd[f"{prefix}.{2*i}.weight"]),
                "bias": _np(sd[f"{prefix}.{2*i}.bias"]),
            }
        }

    params["head"] = entry(0)
    for i in range(nb - 2):
        params[f"body{i}"] = entry(i + 1)
    params["tail"] = entry(nb - 1)
    return params


def convert_dncnn(sd: Dict[str, Any], nb: int = 17) -> Dict[str, Any]:
    return {"params": _seq_conv_params(sd, nb)}


def convert_fdncnn(sd: Dict[str, Any], nb: int = 20) -> Dict[str, Any]:
    return {"params": _seq_conv_params(sd, nb)}


def convert_ffdnet(sd: Dict[str, Any], nb: int = 15) -> Dict[str, Any]:
    return {"params": _seq_conv_params(sd, nb)}


def convert_ircnn(sd: Dict[str, Any]) -> Dict[str, Any]:
    params = {}
    for i in range(7):
        params[f"layer{i}"] = {
            "conv": {
                "kernel": conv_w(sd[f"model.{2*i}.weight"]),
                "bias": _np(sd[f"model.{2*i}.bias"]),
            }
        }
    return {"params": params}


def convert_ircnn_bundle(bundle: Dict[str, Dict[str, Any]]) -> Dict[str, Any]:
    """Stack the 25 per-noise-bin IRCNN state-dicts into one pytree with a
    leading axis of 25 (replaces per-iteration ``load_state_dict`` swaps,
    reference ``【3】:281-288``)."""
    import jax

    per = [convert_ircnn(bundle[str(i)]) for i in range(25)]
    return jax.tree.map(lambda *xs: np.stack(xs), *per)


def convert_drunet(sd: Dict[str, Any], nb: int = 4) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "head": {"kernel": conv_w(sd["m_head.weight"])},
        "tail": {"kernel": conv_w(sd["m_tail.weight"])},
    }

    def resblock(prefix):
        return {
            "conv1": {"kernel": conv_w(sd[f"{prefix}.res.0.weight"])},
            "conv2": {"kernel": conv_w(sd[f"{prefix}.res.2.weight"])},
        }

    for lvl in range(3):
        tdown = f"m_down{lvl+1}"
        for i in range(nb):
            params[f"down{lvl}_res{i}"] = resblock(f"{tdown}.{i}")
        params[f"down{lvl}_ds"] = {"conv": {"kernel": conv_w(sd[f"{tdown}.{nb}.weight"])}}
    for i in range(nb):
        params[f"body_res{i}"] = resblock(f"m_body.{i}")
    for lvl in range(3):
        tup = f"m_up{lvl+1}"
        params[f"up{lvl}_us"] = {"conv": {"kernel": convt_w(sd[f"{tup}.0.weight"])}}
        for i in range(nb):
            params[f"up{lvl}_res{i}"] = resblock(f"{tup}.{i+1}")
    return {"params": params}


def _fold_bn(kernel: np.ndarray, bias, sd: Dict[str, Any], prefix: str,
             out_axis: int = 3, eps: float = 1e-4) -> tuple:
    """Fold an eval-mode BatchNorm2d (reference ``basicblock.conv:72`` —
    momentum 0.9, eps 1e-4, affine) into the preceding conv:
    ``w' = w * g/sqrt(v+eps)`` over the output-channel axis,
    ``b' = (b - mean) * g/sqrt(v+eps) + beta``."""
    gamma = _np(sd[f"{prefix}.weight"])
    beta = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    shape = [1, 1, 1, 1]
    shape[out_axis] = -1
    kernel = kernel * scale.reshape(shape)
    bias = np.zeros_like(mean) if bias is None else np.asarray(bias)
    return kernel, (bias - mean) * scale + beta


def _centry(sd: Dict[str, Any], key: str, bias: bool = True,
            bn: str | None = None, transpose: bool = False) -> Dict[str, Any]:
    """One flax conv param dict from torch keys ``<key>.weight[/bias]``,
    optionally folding the BatchNorm at ``<bn>``."""
    w = (convt_w if transpose else conv_w)(sd[f"{key}.weight"])
    b = _np(sd[f"{key}.bias"]) if bias else None
    if bn is not None:
        w, b = _fold_bn(w, b, sd, bn, out_axis=2 if transpose else 3)
    out = {"kernel": w}
    if b is not None:
        out["bias"] = b
    return out


def convert_unet(sd: Dict[str, Any], nb: int = 2) -> Dict[str, Any]:
    """Reference ``UNet`` (``network_unet.py:16-74``): flattened Sequential
    stages — convs at even slots ('CR' pairs), strideconv/convtranspose
    samplers at the stage tail/head."""
    p: Dict[str, Any] = {"head": _centry(sd, "m_head.0"),
                         "tail": _centry(sd, "m_tail")}
    for lvl in range(3):
        t = f"m_down{lvl+1}"
        for i in range(nb):
            p[f"down{lvl}_conv{i}"] = _centry(sd, f"{t}.{2*i}")
        p[f"down{lvl}_ds"] = {"conv": _centry(sd, f"{t}.{2*nb}")}
    for i in range(nb + 1):
        p[f"body_conv{i}"] = _centry(sd, f"m_body.{2*i}")
    for lvl in range(3):
        t = f"m_up{lvl+1}"
        p[f"up{lvl}_us"] = {"conv": _centry(sd, f"{t}.0", transpose=True)}
        for i in range(nb):
            p[f"up{lvl}_conv{i}"] = _centry(sd, f"{t}.{2*(i+1)}")
    return {"params": p}


def _imd_entry(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """IMDBlock (reference ``basicblock.IMDBlock:248-259``, bias-free as
    used by ResUNet): conv1-3 are 'CL' Sequentials, conv4/conv1x1 bare."""
    return {
        "conv1": _centry(sd, f"{prefix}.conv1.0", bias=False),
        "conv2": _centry(sd, f"{prefix}.conv2.0", bias=False),
        "conv3": _centry(sd, f"{prefix}.conv3.0", bias=False),
        "conv4": _centry(sd, f"{prefix}.conv4", bias=False),
        "conv1x1": _centry(sd, f"{prefix}.conv1x1", bias=False),
    }


def convert_resunet(sd: Dict[str, Any], nb: int = 4) -> Dict[str, Any]:
    """Reference ``ResUNet`` (``network_unet.py:139-204``)."""
    p: Dict[str, Any] = {"head": _centry(sd, "m_head", bias=False),
                         "tail": _centry(sd, "m_tail", bias=False)}
    for lvl in range(3):
        t = f"m_down{lvl+1}"
        for i in range(nb):
            p[f"down{lvl}_imd{i}"] = _imd_entry(sd, f"{t}.{i}")
        p[f"down{lvl}_ds"] = {"conv": _centry(sd, f"{t}.{nb}", bias=False)}
    for i in range(nb):
        p[f"body_imd{i}"] = _imd_entry(sd, f"m_body.{i}")
    for lvl in range(3):
        t = f"m_up{lvl+1}"
        p[f"up{lvl}_us"] = {"conv": _centry(sd, f"{t}.0", bias=False,
                                            transpose=True)}
        for i in range(nb):
            p[f"up{lvl}_imd{i}"] = _imd_entry(sd, f"{t}.{i+1}")
    return {"params": p}


def convert_unet_res_subp(sd: Dict[str, Any], nb: int = 2) -> Dict[str, Any]:
    """Reference ``UNetResSubP`` (``network_unet.py:207-265``): biased
    ResBlocks; samplers are 'conv@nb' down / 'convT@0, blocks@2..' up."""

    def res(prefix):
        return {"conv1": _centry(sd, f"{prefix}.res.0"),
                "conv2": _centry(sd, f"{prefix}.res.2")}

    p: Dict[str, Any] = {"head": _centry(sd, "m_head.0"),
                         "tail": _centry(sd, "m_tail", bias=False)}
    for lvl in range(3):
        t = f"m_down{lvl+1}"
        for i in range(nb):
            p[f"down{lvl}_res{i}"] = res(f"{t}.{i}")
        p[f"down{lvl}_ds"] = {"conv": _centry(sd, f"{t}.{nb}")}
    for i in range(nb + 1):
        p[f"body_res{i}"] = res(f"m_body.{i}")
    for lvl in range(3):
        t = f"m_up{lvl+1}"
        p[f"up{lvl}_us"] = {"conv": _centry(sd, f"{t}.0", transpose=True)}
        for i in range(nb):
            p[f"up{lvl}_res{i}"] = res(f"{t}.{i+2}")
    return {"params": p}


def convert_unet_plus(sd: Dict[str, Any], nb: int = 1) -> Dict[str, Any]:
    """Reference ``UNetPlus`` with act_mode='BR' — the only act string its
    ``act_mode[1]`` indexing (``network_unet.py:292-316``) accepts; every
    'CBR' BatchNorm is folded into its conv."""
    p: Dict[str, Any] = {"head": _centry(sd, "m_head"),
                         "tail": _centry(sd, "m_tail")}
    for lvl in range(3):
        t = f"m_down{lvl+1}"
        for i in range(nb):
            p[f"down{lvl}_conv{i}"] = _centry(sd, f"{t}.{3*i}",
                                              bn=f"{t}.{3*i+1}")
        p[f"down{lvl}_ds"] = {"conv": _centry(sd, f"{t}.{3*nb}")}
    for i in range(nb + 1):
        p[f"body_conv{i}"] = _centry(sd, f"m_body.{3*i}",
                                     bn=f"m_body.{3*i+1}")
    for lvl in range(3):
        t = f"m_up{lvl+1}"
        p[f"up{lvl}_us"] = {"conv": _centry(sd, f"{t}.0", bn=f"{t}.1",
                                            transpose=True)}
        for i in range(nb - 1):
            p[f"up{lvl}_conv{i}"] = _centry(sd, f"{t}.{3*(i+1)}",
                                            bn=f"{t}.{3*(i+1)+1}")
        p[f"up{lvl}_conv{nb-1}"] = _centry(sd, f"{t}.{3*nb}")
    return {"params": p}


def convert_nonlocal_unet(sd: Dict[str, Any], nb: int = 1) -> Dict[str, Any]:
    """Reference ``NonLocalUNet`` (``network_unet.py:342-394``): non-local
    block at slot 0 of m_down3 and the last slot of m_up3; its W conv's
    BatchNorm ('CB') is folded."""

    def nonlocal_entry(prefix):
        return {
            "theta": _centry(sd, f"{prefix}.theta"),
            "phi": _centry(sd, f"{prefix}.phi"),
            "g": _centry(sd, f"{prefix}.g"),
            "w": _centry(sd, f"{prefix}.W.0", bn=f"{prefix}.W.1"),
        }

    p: Dict[str, Any] = {"head": _centry(sd, "m_head.0"),
                         "tail": _centry(sd, "m_tail")}
    for lvl in range(3):
        t = f"m_down{lvl+1}"
        off = 1 if lvl == 2 else 0
        if lvl == 2:
            p["down_nonlocal"] = nonlocal_entry(f"{t}.0")
        for i in range(nb):
            p[f"down{lvl}_conv{i}"] = _centry(sd, f"{t}.{off + 2*i}")
        p[f"down{lvl}_ds"] = {"conv": _centry(sd, f"{t}.{off + 2*nb}")}
    for i in range(nb + 1):
        p[f"body_conv{i}"] = _centry(sd, f"m_body.{2*i}")
    for lvl in range(3):
        t = f"m_up{lvl+1}"
        p[f"up{lvl}_us"] = {"conv": _centry(sd, f"{t}.0", transpose=True)}
        for i in range(nb):
            p[f"up{lvl}_conv{i}"] = _centry(sd, f"{t}.{2*(i+1)}")
        if lvl == 2:
            p["up_nonlocal"] = nonlocal_entry(f"{t}.{2*(nb+1)}")
    return {"params": p}


CONVERTERS = {
    "dncnn": convert_dncnn,
    "fdncnn": convert_fdncnn,
    "ffdnet": convert_ffdnet,
    "ircnn": convert_ircnn,
    "ircnn_bundle": convert_ircnn_bundle,
    "drunet": convert_drunet,
    "unet": convert_unet,
    "resunet": convert_resunet,
    "unet_res_subp": convert_unet_res_subp,
    "unet_plus": convert_unet_plus,
    "nonlocal_unet": convert_nonlocal_unet,
}


def save_npz(params_tree: Dict[str, Any], path: str) -> None:
    """Flatten a converted pytree into an .npz (torch-free deployment)."""
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params_tree)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_npz(path: str) -> Dict[str, Any]:
    """Inverse of ``save_npz``: rebuild the nested pytree."""
    out: Dict[str, Any] = {}
    with np.load(path) as z:
        for name in z.files:
            parts = name.split("/")
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = z[name]
    return out
