"""DRUNet (UNetRes) denoiser (reference ``models/network_unet.py:76-136``).

4-scale residual U-Net: bias-free 3x3 head, three [nb x ResBlock ->
2x2-stride-2 conv] down stages over nc=(64,128,256,512), nb ResBlocks body,
three [2x2 transposed conv -> nb x ResBlock] up stages with ADDITIVE skips
(x = up(x + skip)), bias-free tail. Input carries a sigma-map channel.

At 256x256 the reference wraps the forward in a recursive quad-split tiler
(``utils_model.test_split_fn``) whose min_size=256 makes it a plain forward
— the tiler is therefore not replicated; the x8 dihedral ensemble lives in
``priors/denoiser.py``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from pnp_admm_cnc_mri_tpu.models.blocks import DownStride, ResBlock, UpTranspose


class UNetRes(nn.Module):
    out_nc: int = 1
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 4

    @nn.compact
    def __call__(self, x0):
        nc = self.nc
        h = nn.Conv(nc[0], (3, 3), padding="SAME", use_bias=False, name="head")(x0)

        # skips[0] = head output x1; skips[lvl+1] = post-downsample output of
        # stage lvl (x2, x3, x4) — reference forward sums each skip into the
        # input of the matching up stage / tail: m_up3(x + x4) ... tail(x + x1).
        skips = [h]
        for lvl in range(3):
            for i in range(self.nb):
                h = ResBlock(nc[lvl], name=f"down{lvl}_res{i}")(h)
            h = DownStride(nc[lvl + 1], name=f"down{lvl}_ds")(h)
            skips.append(h)

        for i in range(self.nb):
            h = ResBlock(nc[3], name=f"body_res{i}")(h)

        for lvl in reversed(range(3)):
            h = h + skips[lvl + 1]
            h = UpTranspose(nc[lvl], name=f"up{lvl}_us")(h)
            for i in range(self.nb):
                h = ResBlock(nc[lvl], name=f"up{lvl}_res{i}")(h)

        h = h + skips[0]
        return nn.Conv(self.out_nc, (3, 3), padding="SAME", use_bias=False, name="tail")(h)
