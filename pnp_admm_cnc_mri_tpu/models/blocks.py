"""Flax building blocks for the denoiser models.

TPU-idiomatic choices (vs the reference's PyTorch NCHW modules in
``models/basicblock.py``):

- NHWC layout throughout — XLA's native conv layout on TPU; the weight
  converter transposes torch OIHW kernels to HWIO.
- No BatchNorm: the deployed KAIR checkpoints the reference loads are all
  plain Conv+ReLU stacks at eval time (act_mode 'R', reference
  ``models/network_dncnn.py:59-63``), so blocks here are inference-exact.
- Modules are thin; XLA fuses conv+bias+relu chains on its own.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """3x3 same-padding conv, optional ReLU (reference ``basicblock.conv``
    mode 'C'/'CR')."""

    features: int
    relu: bool = False
    use_bias: bool = True
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """x + conv(relu(conv(x))) with 3x3 no-bias convs (reference
    ``basicblock.ResBlock`` mode 'CRC', used by DRUNet)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, name="conv2")(h)
        return x + h


class DownStride(nn.Module):
    """2x2 stride-2 conv downsampler (reference ``downsample_strideconv``)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (2, 2), strides=(2, 2), padding="VALID", use_bias=False,
            name="conv",
        )(x)


class UpTranspose(nn.Module):
    """2x2 stride-2 transposed-conv upsampler (reference
    ``upsample_convtranspose``)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID", use_bias=False,
            transpose_kernel=True,  # matches torch ConvTranspose2d semantics
            name="conv",
        )(x)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC space-to-depth matching torch PixelUnshuffle channel order.

    torch maps (C, H*r, W*r) -> (C*r*r, H, W) with output channel index
    c*r*r + dy*r + dx; in NHWC that is a reshape/transpose keeping C as the
    slowest axis.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h', w', c, dy, dx
    return x.reshape(n, h // factor, w // factor, c * factor * factor)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC depth-to-space matching torch PixelShuffle channel order."""
    n, h, w, c = x.shape
    co = c // (factor * factor)
    x = x.reshape(n, h, w, co, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, dy, w, dx, co
    return x.reshape(n, h * factor, w * factor, co)


def replication_pad_2d(x: jnp.ndarray, pad_bottom: int, pad_right: int) -> jnp.ndarray:
    """Edge-replication pad on H (bottom) and W (right), NHWC."""
    return jnp.pad(
        x, ((0, 0), (0, pad_bottom), (0, pad_right), (0, 0)), mode="edge"
    )
