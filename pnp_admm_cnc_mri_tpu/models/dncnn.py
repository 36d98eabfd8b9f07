"""DnCNN / IRCNN / FDnCNN denoisers (reference ``models/network_dncnn.py``).

- DnCNN (``:36-67``): nb Conv-ReLU layers (17, or 20 for blind variants),
  nc=64, residual output ``x - model(x)``.
- IRCNN (``:70-109``): 7 convs, dilations 1,2,3,4,3,2,1, residual; the
  checkpoint is a 25-way bundle keyed by noise bin — here the 25 parameter
  sets are STACKED on a leading axis and selected with a gather inside the
  jitted solver loop instead of per-iteration state-dict reloads
  (reference ``【3】PNP_ADMM_L1_D  .py:281-288``).
- FDnCNN (``:120-141``): in_nc=2 (image + noise-level map), nb=20,
  non-residual.

All NHWC; used with batch dims folded in, float32 (or bfloat16 for the
conv-heavy path with a float32 residual add).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from pnp_admm_cnc_mri_tpu.models.blocks import ConvBlock


class DnCNN(nn.Module):
    out_nc: int = 1
    nc: int = 64
    nb: int = 17
    residual: bool = True

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.nc, relu=True, name="head")(x)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, relu=True, name=f"body{i}")(h)
        n = ConvBlock(self.out_nc, relu=False, name="tail")(h)
        if self.residual:
            # residual learning: the network predicts the noise
            return x[..., : self.out_nc] - n
        return n


class FDnCNN(nn.Module):
    """Non-residual DnCNN taking a concatenated noise-level map channel."""

    out_nc: int = 1
    nc: int = 64
    nb: int = 20

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.nc, relu=True, name="head")(x)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, relu=True, name=f"body{i}")(h)
        return ConvBlock(self.out_nc, relu=False, name="tail")(h)


IRCNN_DILATIONS: Sequence[int] = (1, 2, 3, 4, 3, 2, 1)


class IRCNN(nn.Module):
    out_nc: int = 1
    nc: int = 64

    @nn.compact
    def __call__(self, x):
        h = x
        for i, d in enumerate(IRCNN_DILATIONS):
            last = i == len(IRCNN_DILATIONS) - 1
            h = ConvBlock(
                self.out_nc if last else self.nc,
                relu=not last,
                dilation=d,
                name=f"layer{i}",
            )(h)
        return x[..., : self.out_nc] - h
