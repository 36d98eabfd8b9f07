"""Model/parameter pretty-printers.

Pytree equivalents of the reference's ``utils/utils_model.py:253-275``
(``describe_model``: class name + total parameter count + structure;
``describe_params``: per-tensor mean/min/max/std table). Operates on the
framework's parameter pytrees instead of ``nn.Module`` objects.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def num_params(params: Any) -> int:
    """Total number of scalar parameters in the pytree."""
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))


def describe_model(params: Any, name: str = "model") -> str:
    """Name, parameter count, and per-leaf structure (reference
    ``describe_model``, ``utils_model.py:253-260``)."""
    msg = "\n"
    msg += f"models name: {name}\n"
    msg += f"Params number: {num_params(params)}\n"
    msg += "Net structure:\n"
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves:
        shape = tuple(np.shape(leaf))
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        msg += f"  {_path_str(path)}: {shape} {dtype}\n"
    return msg


def describe_params(params: Any) -> str:
    """Per-tensor statistics table (reference ``describe_params``,
    ``utils_model.py:265-275``; same column format)."""
    msg = "\n"
    msg += " | {:^6s} | {:^6s} | {:^6s} | {:^6s} || {:<20s}".format(
        "mean", "min", "max", "std", "param_name") + "\n"
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves:
        v = np.asarray(leaf, np.float32)
        std = v.std(ddof=1) if v.size > 1 else 0.0
        msg += " | {:>6.3f} | {:>6.3f} | {:>6.3f} | {:>6.3f} || {:s}".format(
            float(v.mean()), float(v.min()), float(v.max()), float(std),
            _path_str(path)) + "\n"
    return msg
