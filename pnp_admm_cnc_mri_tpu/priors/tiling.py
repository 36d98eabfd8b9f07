"""Test-mode wrappers: pad / quad-split tiling / x8 ensembles for denoisers.

Capability parity with the reference's ``utils_model.test_mode`` dispatch
(``utils/utils_model.py:12-37``):

    mode 0: plain forward
    mode 1: replication-pad to a modulo, forward, crop
    mode 2: recursive 4-quadrant split with refield-aligned overlap (for
            images too large to denoise in one pass)
    mode 3: x8 dihedral self-ensemble  (see ``denoiser.x8_ensemble``)
    mode 4: quad-split under the x8 ensemble (``split_x8``)
    mode 5: single-level split

Shapes are static at trace time, so the recursion unrolls during jit —
each distinct image size compiles once, exactly like the torch version
re-dispatches per size.

All wrappers take/return NHWC batches (the adapter layer handles (...,H,W)).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.priors.denoiser import x8_ensemble  # noqa: F401 (re-export)


def pad_to_modulo(core: Callable, x: jnp.ndarray, modulo: int = 16) -> jnp.ndarray:
    """Mode 1 (reference ``test_pad:58-65``): edge-pad bottom/right to a
    multiple of ``modulo``, run, crop back."""
    h, w = x.shape[1], x.shape[2]
    pb = int(math.ceil(h / modulo) * modulo - h)
    pr = int(math.ceil(w / modulo) * modulo - w)
    if pb or pr:
        x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)), mode="edge")
    out = core(x)
    return out[:, :h, :w, :]


def quad_split(
    core: Callable,
    x: jnp.ndarray,
    refield: int = 32,
    min_size: int = 256,
    modulo: int = 1,
) -> jnp.ndarray:
    """Mode 2 (reference ``test_split_fn:76-109``): recursive 4-quadrant
    split with overlapping refield-aligned tiles, stitched from the
    interior of each quadrant's output. ``sf`` (super-resolution scale) is
    1 for denoisers; the reference's sf generalization is kept out until a
    SR model family needs it."""
    h, w = x.shape[1], x.shape[2]
    if h * w <= min_size**2:
        return pad_to_modulo(core, x, modulo)

    top = slice(0, (h // 2 // refield + 1) * refield)
    bottom = slice(h - (h // 2 // refield + 1) * refield, h)
    left = slice(0, (w // 2 // refield + 1) * refield)
    right = slice(w - (w // 2 // refield + 1) * refield, w)
    quads = [
        x[:, top, left, :],
        x[:, top, right, :],
        x[:, bottom, left, :],
        x[:, bottom, right, :],
    ]
    if h * w <= 4 * (min_size**2):
        outs = [core(q) for q in quads]
    else:
        outs = [quad_split(core, q, refield, min_size, modulo) for q in quads]

    h2, w2 = h // 2, w // 2
    rows_top = jnp.concatenate(
        [outs[0][:, :h2, :w2, :], outs[1][:, :h2, -(w - w2):, :]], axis=2
    )
    rows_bot = jnp.concatenate(
        [outs[2][:, -(h - h2):, :w2, :], outs[3][:, -(h - h2):, -(w - w2):, :]], axis=2
    )
    return jnp.concatenate([rows_top, rows_bot], axis=1)


def split_x8(
    core: Callable,
    x: jnp.ndarray,
    refield: int = 32,
    min_size: int = 256,
    modulo: int = 1,
) -> jnp.ndarray:
    """Mode 4 (reference ``test_split_x8:177-186``): run the recursive
    quad-split forward inside each of the 8 dihedral ensemble branches."""
    return x8_ensemble(
        lambda v: quad_split(core, v, refield, min_size, modulo), x
    )


def one_split(
    core: Callable, x: jnp.ndarray, refield: int = 32, modulo: int = 1
) -> jnp.ndarray:
    """Mode 5 (reference ``test_onesplit``): always split exactly once."""
    h, w = x.shape[1], x.shape[2]
    top = slice(0, (h // 2 // refield + 1) * refield)
    bottom = slice(h - (h // 2 // refield + 1) * refield, h)
    left = slice(0, (w // 2 // refield + 1) * refield)
    right = slice(w - (w // 2 // refield + 1) * refield, w)
    outs = [
        core(x[:, top, left, :]),
        core(x[:, top, right, :]),
        core(x[:, bottom, left, :]),
        core(x[:, bottom, right, :]),
    ]
    h2, w2 = h // 2, w // 2
    rows_top = jnp.concatenate(
        [outs[0][:, :h2, :w2, :], outs[1][:, :h2, -(w - w2):, :]], axis=2
    )
    rows_bot = jnp.concatenate(
        [outs[2][:, -(h - h2):, :w2, :], outs[3][:, -(h - h2):, -(w - w2):, :]], axis=2
    )
    return jnp.concatenate([rows_top, rows_bot], axis=1)
