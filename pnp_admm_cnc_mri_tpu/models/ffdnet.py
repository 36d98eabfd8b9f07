"""FFDNet denoiser (reference ``models/network_ffdnet.py:31-73``).

PixelUnshuffle(2) -> [conv+relu] x (nb-1) -> conv -> PixelShuffle(2), with
a sigma map concatenated after the unshuffle. Odd sizes are
replication-padded to even then cropped back, as the reference does.
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


class FFDNet(nn.Module):
    out_nc: int = 1
    nc: int = 64
    nb: int = 15
    sf: int = 2

    @nn.compact
    def __call__(self, x, sigma):
        """x: (N,H,W,C); sigma: scalar or (N,1,1,1) noise level in [0,1]."""
        h0, w0 = x.shape[1], x.shape[2]
        pb = (-h0) % self.sf
        pr = (-w0) % self.sf
        if pb or pr:
            x = replication_pad_2d(x, pb, pr)
        d = pixel_unshuffle(x, self.sf)
        sig = jnp.broadcast_to(
            jnp.asarray(sigma, d.dtype).reshape((-1, 1, 1, 1)),
            (d.shape[0], d.shape[1], d.shape[2], 1),
        )
        h = jnp.concatenate([d, sig], axis=-1)
        h = ConvBlock(self.nc, relu=True, name="head")(h)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, relu=True, name=f"body{i}")(h)
        h = ConvBlock(self.out_nc * self.sf * self.sf, relu=False, name="tail")(h)
        out = pixel_shuffle(h, self.sf)
        return out[:, :h0, :w0, :]
