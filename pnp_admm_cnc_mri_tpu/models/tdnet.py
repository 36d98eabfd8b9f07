"""TDNet: the TPU-shaped (MXU-native) denoiser prior.

New architecture with no reference counterpart. Parity freezes the five
reference CNNs (``models/network_*.py``) for the six reference pipelines,
but the framework's NEW pipelines (FISTA/HQS/RED/consensus/SR/deblur)
carry no such constraint — so this model is designed for the v5e MXU
instead (VERDICT r2 #4: nc=64 half-fills the 128-wide systolic array, 21%
measured occupancy; nc=128 measured 59%):

- **PixelUnshuffle(2)** (FFDNet's trick, reference
  ``models/network_ffdnet.py:31-73``): spatial positions quartered, so
  the conv stack runs 4x fewer MXU tiles per layer at the same receptive
  field growth PER LAYER (each half-res pixel covers 2x2).
- **nc=128 everywhere**: every conv contraction exactly fills the
  128-lane MXU (no padding waste at bf16).
- **Residual output**: the network predicts the noise at half-res; the
  full-res output is ``x - PixelShuffle(noise)`` (DnCNN-style residual
  learning, easier optimization at moderate depth).
- **Sigma-map conditioning** at half-res (one channel), so one model
  serves the whole ``get_rho_sigma`` ladder.

FLOPs at 256^2, nc=128, nb=12: ~49 GFLOP/forward vs DnCNN-17's ~73 —
fewer flops at ~3x the MXU utilization.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.models.blocks import (
    ConvBlock,
    pixel_shuffle,
    pixel_unshuffle,
    replication_pad_2d,
)


class TDNet(nn.Module):
    out_nc: int = 1
    nc: int = 128
    nb: int = 12
    sf: int = 2

    @nn.compact
    def __call__(self, x, sigma):
        """x: (N,H,W,C); sigma: scalar or (N,) or (N,1,1,1) noise level
        in [0,1]. Returns the denoised image (residual subtracted)."""
        h0, w0 = x.shape[1], x.shape[2]
        pb = (-h0) % self.sf
        pr = (-w0) % self.sf
        xp = replication_pad_2d(x, pb, pr) if (pb or pr) else x
        d = pixel_unshuffle(xp, self.sf)
        sig = jnp.broadcast_to(
            jnp.asarray(sigma, d.dtype).reshape((-1, 1, 1, 1)),
            (d.shape[0], d.shape[1], d.shape[2], 1),
        )
        h = jnp.concatenate([d, sig], axis=-1)
        h = ConvBlock(self.nc, relu=True, name="head")(h)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, relu=True, name=f"body{i}")(h)
        h = ConvBlock(self.out_nc * self.sf * self.sf, relu=False,
                      name="tail")(h)
        noise = pixel_shuffle(h, self.sf)[:, :h0, :w0, :]
        return x - noise
