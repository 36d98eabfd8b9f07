"""Device mesh and sharding helpers for scenario-grid parallelism.

The reference has no parallelism at all (SURVEY.md §2.5); this layer is a
new first-class design: the scaling axis is the *scenario grid* — images x
masks x noise levels — sharded over a ``jax.sharding.Mesh`` with
``NamedSharding``. XLA inserts the collectives; convergence/metric
reductions ride ``psum`` over ICI.

Axis conventions:
  - ``data``: scenario batch (images and/or hyper-parameter grid points)
  - ``space``: optional intra-image sharding of the H axis for very large
    images (2-D FFT decomposes into row FFT + all-to-all + col FFT; for the
    256x256 workloads we keep images unsharded and let ``data`` scale).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, space) mesh over the available devices.

    Defaults to all devices on the ``data`` axis — the right layout for
    embarrassingly-parallel scenario grids where each chip owns whole
    images and no inter-chip traffic happens inside an iteration.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    if n_data * n_space != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_space} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_space)
    return Mesh(arr, axis_names=("data", "space"))


def shard_batch(x, mesh: Mesh):
    """Place an array on the mesh's ``data`` axis (leading axis sharded).

    Multi-axis scenario grids should be flattened to one leading axis
    first (e.g. ``x.reshape(-1, H, W)``)."""
    spec = P(*(("data",) + (None,) * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    """Replicate an array (masks, noise, weights) across the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad a batch axis so it divides the mesh; returns (padded, true_n).

    Scenario grids rarely divide the chip count exactly; padding with
    repeated entries keeps shapes static (XLA requirement) while metrics
    mask out the padding.
    """
    n = x.shape[axis]
    target = math.ceil(n / multiple) * multiple
    if target == n:
        return x, n
    pad_idx = np.arange(target) % n
    return np.take(x, pad_idx, axis=axis), n
