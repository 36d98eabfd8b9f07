"""Intra-image spatial sharding: distributed 2-D FFT + spatially-sharded ADMM.

For images too large for one chip (or to cut per-chip memory), the H axis
is sharded over the mesh ``space`` axis and the 2-D FFT decomposes the
classic SPMD way (SURVEY.md §5 long-context analog):

    rows local:  FFT along W on the (H/n, W) shard
    all_to_all:  (H/n, W) -> (H, W/n) transposition over ICI
    cols local:  FFT along H on the (H, W/n) shard

so the spectrum comes out W-sharded; the inverse reverses the pipeline.
The ADMM x-update runs entirely in the W-sharded spectrum layout (the
mask blend is pointwise), so one iteration costs exactly two all_to_alls
— the minimum communication for a distributed 2-D FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.ops import prox


def fft2_rows_to_cols(x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Local (..., H/n, W) row-shard -> W-sharded spectrum (..., H, W/n)."""
    n = jax.lax.axis_size(axis_name)
    x_local = jnp.fft.fft(x_local, axis=-1)  # along W, local
    hs = x_local.shape[-2]
    ws = x_local.shape[-1] // n
    x_split = x_local.reshape(x_local.shape[:-1] + (n, ws))  # (..., H/n, n, W/n)
    gathered = jax.lax.all_to_all(
        x_split, axis_name, split_axis=x_split.ndim - 2, concat_axis=x_split.ndim - 3,
        tiled=False,
    )  # (..., n, H/n, W/n) with the n axis enumerating row blocks
    full = gathered.reshape(gathered.shape[:-3] + (n * hs, ws))  # (..., H, W/n)
    return jnp.fft.fft(full, axis=-2)  # along H, local


def ifft2_cols_to_rows(f_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inverse: W-sharded spectrum (..., H, W/n) -> row-shard (..., H/n, W)."""
    n = jax.lax.axis_size(axis_name)
    f_local = jnp.fft.ifft(f_local, axis=-2)  # along H, local
    h = f_local.shape[-2]
    hs = h // n
    f_split = f_local.reshape(f_local.shape[:-2] + (n, hs, f_local.shape[-1]))
    gathered = jax.lax.all_to_all(
        f_split, axis_name, split_axis=f_split.ndim - 3, concat_axis=f_split.ndim - 2,
        tiled=False,
    )  # (..., hs, n, W/n)
    rows = gathered.reshape(f_split.shape[:-3] + (hs, -1))  # (..., H/n, W)
    return jnp.fft.ifft(rows, axis=-1)


def spatial_admm_l1(
    y: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: ADMMConfig,
    mesh: Mesh,
    axis: str = "space",
    dtype=jnp.float32,
):
    """ADMM-L1 with the image H axis sharded over ``axis``.

    ``y``/``mask`` are given unsharded (H, W) [or batched (..., H, W)];
    they are placed W-sharded (spectrum layout) / row-sharded respectively.
    Returns the reconstructed image, H-row-sharded then gathered.
    """
    la2 = 1.0 / (2.0 * cfg.rho)
    thr = cfg.rho * cfg.lam

    def local(y_spec, mask_spec):
        # y_spec, mask_spec: W-sharded spectrum-layout shards (..., H, W/n)
        x0 = jnp.abs(ifft2_cols_to_rows(y_spec, axis)).astype(dtype)  # rows
        state = (x0, x0, jnp.zeros_like(x0))  # (x, z, w) — x carried so the
        # returned iterate matches the single-device solver (x from the
        # LAST iteration, before the final z/w update)

        def step(carry, i):
            _, z, w = carry
            vf = fft2_rows_to_cols((z - w).astype(dtype), axis)
            blended = (la2 * vf + y_spec) / (1.0 + la2)
            xf = jnp.where(mask_spec != 0, blended, vf)
            x = jnp.abs(jnp.real(ifft2_cols_to_rows(xf, axis))).astype(dtype)
            z_new = prox.soft(x + w, thr)
            w_new = w + x - z_new
            return (x, z_new, w_new), None

        (x, z, w), _ = jax.lax.scan(step, state, jnp.arange(cfg.iter_num))
        return x

    spec_in = P(*((None,) * (y.ndim - 1) + (axis,)))  # shard last (W) axis
    spec_out = P(*((None,) * (y.ndim - 2) + (axis, None)))  # rows sharded

    f = jax.shard_map(local, mesh=mesh, in_specs=(spec_in, spec_in), out_specs=spec_out)
    y_d = jax.device_put(y, NamedSharding(mesh, spec_in))
    m_d = jax.device_put(mask.astype(y.real.dtype), NamedSharding(mesh, spec_in))
    return f(y_d, m_d)
