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


def _act(h: jnp.ndarray, act: str, slope: float = 0.2) -> jnp.ndarray:
    """Activation selector mirroring the reference conv-factory mode chars
    ('R' relu / 'L' leaky / '' none, ``basicblock.conv:63-100``)."""
    if act in ("R", "r"):
        return nn.relu(h)
    if act in ("L", "l"):
        return nn.leaky_relu(h, negative_slope=slope)
    if act == "":
        return h
    raise ValueError(f"unknown activation {act!r}")


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
    """x + conv(relu(conv(x))) with 3x3 convs (reference
    ``basicblock.ResBlock`` mode 'CRC'; DRUNet uses the no-bias default,
    UNetResSubP the biased variant)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv2")(h)
        return x + h


class DownStride(nn.Module):
    """2x2 stride-2 conv downsampler (reference ``downsample_strideconv``),
    optionally biased + activated (mode '2R' for the non-Res U-Nets)."""

    features: int
    use_bias: bool = False
    act: str = ""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (2, 2), strides=(2, 2), padding="VALID",
            use_bias=self.use_bias, name="conv",
        )(x)
        return _act(x, self.act)


class UpTranspose(nn.Module):
    """2x2 stride-2 transposed-conv upsampler (reference
    ``upsample_convtranspose``), optionally biased + activated."""

    features: int
    use_bias: bool = False
    act: str = ""

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID",
            use_bias=self.use_bias,
            transpose_kernel=True,  # matches torch ConvTranspose2d semantics
            name="conv",
        )(x)
        return _act(x, self.act)


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


# ---------------------------------------------------------------------------
# Blocks below back the reference's *unused* architecture catalog
# (``models/basicblock.py:232-536`` and the U-Net variants in
# ``models/network_unet.py:16-394``) so the full model family is available.
# Eval-mode BatchNorm is folded into the preceding conv by the weight
# converter (``models/convert.py``) — the inference graphs here are
# norm-free, which is both TPU-friendlier and exactly what the reference's
# frozen ``.eval()`` modules compute.
# ---------------------------------------------------------------------------


class IMDBlock(nn.Module):
    """Information multi-distillation block (reference
    ``basicblock.IMDBlock:232-266``): three conv+act stages each splitting
    off ``d_nc`` distilled channels, a final conv on the remainder, a 1x1
    fuse over the concatenated distillations, residual add. NHWC split along
    the trailing channel axis (torch splits dim=1)."""

    features: int
    d_rate: float = 0.25
    act: str = "L"
    slope: float = 0.05
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        d_nc = int(self.features * self.d_rate)

        def cv(h, out, name, kernel=3, act=self.act):
            h = nn.Conv(out, (kernel, kernel), padding="SAME",
                        use_bias=self.use_bias, name=name)(h)
            return _act(h, act, self.slope)

        h = cv(x, self.features, "conv1")
        d1, r = h[..., :d_nc], h[..., d_nc:]
        h = cv(r, self.features, "conv2")
        d2, r = h[..., :d_nc], h[..., d_nc:]
        h = cv(r, self.features, "conv3")
        d3, r = h[..., :d_nc], h[..., d_nc:]
        r4 = cv(r, d_nc, "conv4", act="")
        fused = cv(jnp.concatenate([d1, d2, d3, r4], axis=-1), self.features,
                   "conv1x1", kernel=1, act="")
        return x + fused


class CALayer(nn.Module):
    """Squeeze-and-excite channel attention (reference
    ``basicblock.CALayer:277-294``): global average pool -> 1x1 bottleneck
    (ReLU) -> 1x1 expand (sigmoid) -> channel-wise rescale."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(self.features // self.reduction, (1, 1), name="fc1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), name="fc2")(y)
        return x * nn.sigmoid(y)


class RCABlock(nn.Module):
    """Residual channel-attention block (reference
    ``basicblock.RCABlock:298-313``): conv-act-conv -> CALayer -> + x."""

    features: int
    act: str = "R"
    reduction: int = 16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv1")(x)
        h = _act(h, self.act)
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv2")(h)
        h = CALayer(self.features, self.reduction, name="ca")(h)
        return x + h


class RCAGroup(nn.Module):
    """Residual group of ``nb`` RCABlocks plus a trailing conv, with an
    outer residual (reference ``basicblock.RCAGroup:317-331``)."""

    features: int
    nb: int = 12
    act: str = "R"
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.nb):
            h = RCABlock(self.features, self.act, self.reduction,
                         name=f"rcab{i}")(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv")(h)
        return x + h


class ResidualDenseBlock5C(nn.Module):
    """5-conv residual dense block (reference
    ``basicblock.ResidualDenseBlock_5C:337-357``): dense concats feeding
    ``gc`` growth channels, final conv back to ``features``, 0.2-scaled
    residual."""

    features: int
    gc: int = 32
    act: str = "R"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        feats = [x]

        def cv(out, name, act):
            h = nn.Conv(out, (3, 3), padding="SAME", use_bias=self.use_bias,
                        name=name)(jnp.concatenate(feats, axis=-1))
            return _act(h, act)

        for i in range(4):
            feats.append(cv(self.gc, f"conv{i+1}", self.act))
        out = cv(self.features, "conv5", "")
        return out * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block: three RDB5Cs, 0.2-scaled residual
    (reference ``basicblock.RRDB:360-372``)."""

    features: int
    gc: int = 32
    act: str = "R"

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(3):
            h = ResidualDenseBlock5C(self.features, self.gc, self.act,
                                     name=f"rdb{i+1}")(h)
        return h * 0.2 + x


class NonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local attention (reference
    ``basicblock.NonLocalBlock2D:487-536``): 1x1 theta/phi/g projections to
    C/2, softmax(theta.phi^T).g over flattened space, 1x1 W projection back
    (the reference's trailing eval-mode BatchNorm is converter-folded into
    W), residual add. einsum attention rides the MXU."""

    features: int
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        inter = self.features // 2
        theta = nn.Conv(inter, (1, 1), name="theta")(x).reshape(n, h * w, inter)
        phi = nn.Conv(inter, (1, 1), name="phi")(x)
        g = nn.Conv(inter, (1, 1), name="g")(x)
        if self.downsample:  # reference maxpool path (kernel=stride=2)
            phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
            g = nn.max_pool(g, (2, 2), strides=(2, 2))
        phi = phi.reshape(n, -1, inter)
        g = g.reshape(n, -1, inter)
        att = nn.softmax(jnp.einsum("nqc,nkc->nqk", theta, phi), axis=-1)
        y = jnp.einsum("nqk,nkc->nqc", att, g).reshape(n, h, w, inter)
        return x + nn.Conv(self.features, (1, 1), name="w")(y)


class DownMaxPool(nn.Module):
    """2x2/2 max-pool then 3x3 conv (+act) (reference
    ``basicblock.downsample_maxpool:451-460``; the reference's VALID tail
    padding is a latent shape bug in dead code — SAME is used here so skip
    connections line up)."""

    features: int
    act: str = ""
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv")(x)
        return _act(x, self.act)


class DownAvgPool(nn.Module):
    """2x2/2 average-pool then 3x3 conv (+act) (reference
    ``basicblock.downsample_avgpool:464-473``)."""

    features: int
    act: str = ""
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv")(x)
        return _act(x, self.act)


class UpNearestConv(nn.Module):
    """Nearest-neighbor 2x upsample then 3x3 conv (+act) (reference
    ``basicblock.upsample_upconv:399-409``)."""

    features: int
    act: str = ""
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv")(x)
        return _act(x, self.act)


class UpPixelShuffle(nn.Module):
    """3x3 conv to 4*features then depth-to-space (+act) (reference
    ``basicblock.upsample_pixelshuffle:390-394``)."""

    features: int
    act: str = ""
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features * 4, (3, 3), padding="SAME",
                    use_bias=self.use_bias, name="conv")(x)
        x = pixel_shuffle(x, 2)
        return _act(x, self.act)
