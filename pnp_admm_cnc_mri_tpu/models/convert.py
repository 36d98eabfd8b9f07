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


CONVERTERS = {
    "dncnn": convert_dncnn,
    "fdncnn": convert_fdncnn,
    "ffdnet": convert_ffdnet,
    "ircnn": convert_ircnn,
    "ircnn_bundle": convert_ircnn_bundle,
    "drunet": convert_drunet,
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
