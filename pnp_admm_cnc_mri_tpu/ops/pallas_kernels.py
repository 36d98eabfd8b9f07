"""Pallas TPU kernels for the fused pointwise tail of an ADMM iteration.

Each ADMM iteration is [ifft -> pointwise chain -> fft]. XLA fuses much of
the chain already; these kernels guarantee the whole prox + dual-ascent +
next-input tail runs as ONE VMEM-resident pass per image:

    L1 tail:   z' = soft(x + w, c); w' = w + x - z'
    CNC tail:  s = soft(z, 1/b); t = (1-a) z + a (x+w) + a r l b (z - s);
               z' = soft(t, a r l); w' = w + x - z'

reading x, z, w once from HBM and writing z', w' once — the minimum
memory traffic possible for the non-FFT part of the iteration (the op is
bandwidth-bound; there is no FLOP side to optimize).

Kernels fall back to plain jnp on non-TPU backends (interpret mode) and on
tile-unfriendly shapes; numerical equivalence is tested either way.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pnp_admm_cnc_mri_tpu.ops import prox


FORCE_INTERPRET = False
"""Set True (tests) to run the Pallas path in interpreter mode on CPU."""


def _on_tpu() -> bool:
    if FORCE_INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# Inside kernel bodies we use prox.soft directly — it is pure jnp, which
# Pallas lowers like any other VPU op, so there is exactly one definition
# of the shrinkage math in the codebase.
_soft = prox.soft


# ---------------------------------------------------------------------------
# L1 tail
# ---------------------------------------------------------------------------


def _l1_tail_kernel(c_ref, x_ref, z_ref, w_ref, zo_ref, wo_ref):
    c = c_ref[0]
    x = x_ref[:]
    w = w_ref[:]
    z_new = _soft(x + w, c)
    w_new = w + x - z_new
    zo_ref[:] = z_new
    wo_ref[:] = w_new


def _tileable(shape) -> bool:
    return len(shape) >= 2 and shape[-1] % 128 == 0 and shape[-2] % 8 == 0


def l1_tail(x: jnp.ndarray, z: jnp.ndarray, w: jnp.ndarray, c) -> tuple:
    """Fused L1 z/w/dual update; returns (z_new, w_new)."""
    if not (_on_tpu() and _tileable(x.shape)):
        z_new = prox.soft(x + w, c)
        w_new = w + x - z_new
        return z_new, w_new

    orig_shape = x.shape
    h, wd = x.shape[-2:]
    xs = x.reshape(-1, h, wd)
    zs = z.reshape(-1, h, wd)
    ws = w.reshape(-1, h, wd)
    b = xs.shape[0]
    c_arr = jnp.asarray(c, x.dtype).reshape((1,))

    spec = pl.BlockSpec((1, h, wd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _l1_tail_kernel,
        grid=(b,),
        interpret=FORCE_INTERPRET,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec,
            spec,
            spec,
        ],
        out_specs=(spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct(xs.shape, x.dtype) for _ in range(2)),
    )(c_arr, xs, zs, ws)
    return tuple(o.reshape(orig_shape) for o in out)


# ---------------------------------------------------------------------------
# CNC tail
# ---------------------------------------------------------------------------


def _cnc_tail_kernel(p_ref, x_ref, z_ref, w_ref, zo_ref, wo_ref):
    alpha, rho, lam, b = p_ref[0], p_ref[1], p_ref[2], p_ref[3]
    x = x_ref[:]
    z = z_ref[:]
    w = w_ref[:]
    s = _soft(z, 1.0 / b)
    arlb = alpha * rho * lam * b
    t = (1.0 - alpha) * z + alpha * (x + w) + arlb * (z - s)
    z_new = _soft(t, alpha * rho * lam)
    w_new = w + x - z_new
    zo_ref[:] = z_new
    wo_ref[:] = w_new


def cnc_tail(x, z, w, alpha, rho, lam, b) -> tuple:
    """Fused CNC z/w/dual update; returns (z_new, w_new)."""
    if not (_on_tpu() and _tileable(x.shape)):
        z_new = prox.cnc_update(z, x + w, alpha, rho, lam, b)
        w_new = w + x - z_new
        return z_new, w_new

    orig_shape = x.shape
    h, wd = x.shape[-2:]
    xs = x.reshape(-1, h, wd)
    zs = z.reshape(-1, h, wd)
    ws = w.reshape(-1, h, wd)
    bsz = xs.shape[0]
    p = jnp.asarray([alpha, rho, lam, b], x.dtype)

    spec = pl.BlockSpec((1, h, wd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _cnc_tail_kernel,
        grid=(bsz,),
        interpret=FORCE_INTERPRET,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec,
            spec,
            spec,
        ],
        out_specs=(spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct(xs.shape, x.dtype) for _ in range(2)),
    )(p, xs, zs, ws)
    return tuple(o.reshape(orig_shape) for o in out)
