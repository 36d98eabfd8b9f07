"""The reference's remaining U-Net catalog (``models/network_unet.py:16-394``).

These architectures are vendored-but-unused by the reference's six entry
scripts (only ``UNetRes``/DRUNet is ever loaded), but they are part of its
model inventory, so TPU-native NHWC equivalents live here: ``UNet``
(``network_unet.py:16-74``), ``ResUNet`` (``:139-204``, IMD blocks +
pad-to-8), ``UNetResSubP`` (``:207-265``, pixel-unshuffle front/back),
``UNetPlus`` (``:268-334``) and ``NonLocalUNet`` (``:342-394``, non-local
attention around the deepest down/up stages).

Shared topology (reference forwards, e.g. ``:63-74``): head -> three
[blocks -> downsample] stages over ``nc`` channels with saved skips ->
body -> three [upsample -> blocks] stages consuming ``x + skip`` -> tail,
plus a global ``+ x0`` residual for every variant except the Res family.

TPU-idiomatic deviations (documented, all inference-exact given converter
BN folding):

- NHWC layout; eval-mode BatchNorm is folded into the preceding conv by
  ``models.convert`` (the graphs here are norm-free).
- ``UNetPlus``'s downsampler activation indexing (``act_mode[1]``) assumes
  a two-char 'BR' mode and crashes on the declared default 'R'; here the
  activation string is applied directly.
- ``downsample_maxpool``'s VALID 3x3 tail conv (a latent shape bug in dead
  reference code) uses SAME padding so skip connections line up.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from pnp_admm_cnc_mri_tpu.models.blocks import (
    DownAvgPool,
    DownMaxPool,
    DownStride,
    IMDBlock,
    ResBlock,
    UpNearestConv,
    UpPixelShuffle,
    UpTranspose,
    pixel_shuffle,
    pixel_unshuffle,
    replication_pad_2d,
    _act,
)

_DOWN = {"strideconv": DownStride, "maxpool": DownMaxPool, "avgpool": DownAvgPool}
_UP = {"convtranspose": UpTranspose, "upconv": UpNearestConv,
       "pixelshuffle": UpPixelShuffle}


def _conv(features, use_bias=True, name=None):
    return nn.Conv(features, (3, 3), padding="SAME", use_bias=use_bias,
                   name=name)


class UNet(nn.Module):
    """Plain conv U-Net with additive skips and a global input residual
    (reference ``network_unet.py:16-74``; act 'R', biased convs)."""

    out_nc: int = 1
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 2
    act: str = "R"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x0):
        nc, act = self.nc, self.act
        down, up = _DOWN[self.downsample_mode], _UP[self.upsample_mode]
        h = _act(_conv(nc[0], name="head")(x0), act)
        skips = [h]
        for lvl in range(3):
            for i in range(self.nb):
                h = _act(_conv(nc[lvl], name=f"down{lvl}_conv{i}")(h), act)
            h = down(nc[lvl + 1], use_bias=True, act=act,
                     name=f"down{lvl}_ds")(h)
            skips.append(h)
        for i in range(self.nb + 1):
            h = _act(_conv(nc[3], name=f"body_conv{i}")(h), act)
        for lvl in reversed(range(3)):
            h = up(nc[lvl], use_bias=True, act=act, name=f"up{lvl}_us")(
                h + skips[lvl + 1])
            for i in range(self.nb):
                h = _act(_conv(nc[lvl], name=f"up{lvl}_conv{i}")(h), act)
        return _conv(self.out_nc, name="tail")(h + skips[0]) + x0


class ResUNet(nn.Module):
    """IMD-block U-Net with replication pad to a multiple of 8 (reference
    ``network_unet.py:139-204``; act 'L' slope 0.05, bias-free convs,
    no global residual)."""

    out_nc: int = 1
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 4
    act: str = "L"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x0):
        nc = self.nc
        down, up = _DOWN[self.downsample_mode], _UP[self.upsample_mode]
        _, hh, ww, _ = x0.shape
        x = replication_pad_2d(x0, (-hh) % 8, (-ww) % 8)
        h = _conv(nc[0], use_bias=False, name="head")(x)
        skips = [h]
        for lvl in range(3):
            for i in range(self.nb):
                h = IMDBlock(nc[lvl], act=self.act, use_bias=False,
                             name=f"down{lvl}_imd{i}")(h)
            h = down(nc[lvl + 1], use_bias=False, name=f"down{lvl}_ds")(h)
            skips.append(h)
        for i in range(self.nb):
            h = IMDBlock(nc[3], act=self.act, use_bias=False,
                         name=f"body_imd{i}")(h)
        for lvl in reversed(range(3)):
            h = up(nc[lvl], use_bias=False, name=f"up{lvl}_us")(
                h + skips[lvl + 1])
            for i in range(self.nb):
                h = IMDBlock(nc[lvl], act=self.act, use_bias=False,
                             name=f"up{lvl}_imd{i}")(h)
        h = _conv(self.out_nc, use_bias=False, name="tail")(h + skips[0])
        return h[:, :hh, :ww, :]


class UNetResSubP(nn.Module):
    """Sub-pixel UNetRes: pixel-unshuffle(2) front, biased ResBlocks, a
    4x-channel tail re-shuffled to full resolution, global residual
    (reference ``network_unet.py:207-265``)."""

    out_nc: int = 1
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 2
    act: str = "R"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x0):
        nc, act = self.nc, self.act
        down, up = _DOWN[self.downsample_mode], _UP[self.upsample_mode]
        x = pixel_unshuffle(x0, 2)
        h = _act(_conv(nc[0], name="head")(x), act)
        skips = [h]
        for lvl in range(3):
            for i in range(self.nb):
                h = ResBlock(nc[lvl], use_bias=True,
                             name=f"down{lvl}_res{i}")(h)
            h = down(nc[lvl + 1], use_bias=True, act=act,
                     name=f"down{lvl}_ds")(h)
            skips.append(h)
        for i in range(self.nb + 1):
            h = ResBlock(nc[3], use_bias=True, name=f"body_res{i}")(h)
        for lvl in reversed(range(3)):
            h = up(nc[lvl], use_bias=True, act=act, name=f"up{lvl}_us")(
                h + skips[lvl + 1])
            for i in range(self.nb):
                h = ResBlock(nc[lvl], use_bias=True,
                             name=f"up{lvl}_res{i}")(h)
        h = _conv(self.out_nc * 4, use_bias=False, name="tail")(h + skips[0])
        return pixel_shuffle(h, 2) + x0


class UNetPlus(nn.Module):
    """UNet variant whose up stages drop the activation on their last conv
    (reference ``network_unet.py:268-334``; BN converter-folded)."""

    out_nc: int = 1
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 1
    act: str = "R"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x0):
        nc, act = self.nc, self.act
        down, up = _DOWN[self.downsample_mode], _UP[self.upsample_mode]
        h = _conv(nc[0], name="head")(x0)
        skips = [h]
        for lvl in range(3):
            for i in range(self.nb):
                h = _act(_conv(nc[lvl], name=f"down{lvl}_conv{i}")(h), act)
            h = down(nc[lvl + 1], use_bias=True, act=act,
                     name=f"down{lvl}_ds")(h)
            skips.append(h)
        for i in range(self.nb + 1):
            h = _act(_conv(nc[3], name=f"body_conv{i}")(h), act)
        for lvl in reversed(range(3)):
            h = up(nc[lvl], use_bias=True, act=act, name=f"up{lvl}_us")(
                h + skips[lvl + 1])
            for i in range(self.nb):
                h = _act(_conv(nc[lvl], name=f"up{lvl}_conv{i}")(h), act)
        return _conv(self.out_nc, name="tail")(h + skips[0]) + x0


class NonLocalUNet(nn.Module):
    """UNet with embedded-Gaussian non-local attention entering the deepest
    down stage and leaving the matching up stage (reference
    ``network_unet.py:342-394``)."""

    out_nc: int = 1
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 1
    act: str = "R"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x0):
        from pnp_admm_cnc_mri_tpu.models.blocks import NonLocalBlock

        nc, act = self.nc, self.act
        down, up = _DOWN[self.downsample_mode], _UP[self.upsample_mode]
        h = _act(_conv(nc[0], name="head")(x0), act)
        skips = [h]
        for lvl in range(3):
            if lvl == 2:
                h = NonLocalBlock(nc[2], name="down_nonlocal")(h)
            for i in range(self.nb):
                h = _act(_conv(nc[lvl], name=f"down{lvl}_conv{i}")(h), act)
            h = down(nc[lvl + 1], use_bias=True, act=act,
                     name=f"down{lvl}_ds")(h)
            skips.append(h)
        for i in range(self.nb + 1):
            h = _act(_conv(nc[3], name=f"body_conv{i}")(h), act)
        for lvl in reversed(range(3)):
            h = up(nc[lvl], use_bias=True, act=act, name=f"up{lvl}_us")(
                h + skips[lvl + 1])
            for i in range(self.nb):
                h = _act(_conv(nc[lvl], name=f"up{lvl}_conv{i}")(h), act)
            if lvl == 2:
                h = NonLocalBlock(nc[2], name="up_nonlocal")(h)
        return _conv(self.out_nc, name="tail")(h + skips[0]) + x0
