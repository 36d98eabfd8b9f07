"""Parity for the reference's unused U-Net catalog + basicblock extras.

Same oracle pattern as tests/test_models.py: instantiate the ACTUAL
reference torch modules (``models/network_unet.py:16-394``,
``models/basicblock.py:232-536``) with random weights, convert, and require
allclose outputs — validating both the NHWC transcription and the converter
(including eval-mode BatchNorm folding).
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF = "/root/reference"
if os.path.isdir(os.path.join(REF, "models")):
    sys.path.insert(0, REF)

ref_unet = pytest.importorskip("models.network_unet")
ref_blocks = pytest.importorskip("models.basicblock")

from pnp_admm_cnc_mri_tpu.models import convert  # noqa: E402
from pnp_admm_cnc_mri_tpu.models import unet_variants as uv  # noqa: E402
from pnp_admm_cnc_mri_tpu.models.blocks import (  # noqa: E402
    RCABlock,
    RCAGroup,
    RRDB,
)

TOL = dict(rtol=2e-4, atol=2e-5)
NC = (8, 12, 16, 20)


def nchw_to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def nhwc_to_nchw(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def randomize_bn_stats(module, seed=0):
    """Fresh BatchNorm2d has mean=0/var=1, which would make folding
    trivially correct — randomize the running stats so the fold is
    actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


@torch.no_grad()
def test_unet_parity():
    tm = ref_unet.UNet(in_nc=1, out_nc=1, nc=list(NC), nb=2, act_mode="R").eval()
    fm = uv.UNet(out_nc=1, nc=NC, nb=2)
    params = convert.convert_unet(tm.state_dict(), nb=2)
    x = torch.randn(2, 1, 16, 16)
    np.testing.assert_allclose(
        nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x))), tm(x).numpy(), **TOL
    )


@torch.no_grad()
def test_resunet_parity():
    tm = ref_unet.ResUNet(in_nc=1, out_nc=1, nc=list(NC), nb=2, act_mode="L").eval()
    fm = uv.ResUNet(out_nc=1, nc=NC, nb=2)
    params = convert.convert_resunet(tm.state_dict(), nb=2)
    # 20x20 exercises the replication pad-to-multiple-of-8 + crop path
    x = torch.randn(1, 1, 20, 20)
    np.testing.assert_allclose(
        nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x))), tm(x).numpy(), **TOL
    )


@torch.no_grad()
def test_unet_res_subp_parity():
    tm = ref_unet.UNetResSubP(
        in_nc=1, out_nc=1, nc=list(NC), nb=2, act_mode="R"
    ).eval()
    fm = uv.UNetResSubP(out_nc=1, nc=NC, nb=2)
    params = convert.convert_unet_res_subp(tm.state_dict(), nb=2)
    x = torch.randn(1, 1, 32, 32)  # /2 subpixel then /8 U-Net
    np.testing.assert_allclose(
        nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x))), tm(x).numpy(), **TOL
    )


@torch.no_grad()
def test_unet_plus_parity():
    # act_mode='BR' is the only act string UNetPlus's act_mode[1] indexing
    # accepts (network_unet.py:292-316); its BN folds into the convs.
    tm = ref_unet.UNetPlus(in_nc=1, out_nc=1, nc=list(NC), nb=2, act_mode="BR")
    randomize_bn_stats(tm)
    tm = tm.eval()
    fm = uv.UNetPlus(out_nc=1, nc=NC, nb=2)
    params = convert.convert_unet_plus(tm.state_dict(), nb=2)
    x = torch.randn(1, 1, 16, 16)
    np.testing.assert_allclose(
        nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x))), tm(x).numpy(), **TOL
    )


@torch.no_grad()
def test_nonlocal_unet_parity():
    tm = ref_unet.NonLocalUNet(in_nc=1, out_nc=1, nc=list(NC), nb=1, act_mode="R")
    randomize_bn_stats(tm)
    tm = tm.eval()
    fm = uv.NonLocalUNet(out_nc=1, nc=NC, nb=1)
    params = convert.convert_nonlocal_unet(tm.state_dict(), nb=1)
    x = torch.randn(1, 1, 16, 16)
    np.testing.assert_allclose(
        nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x))), tm(x).numpy(), **TOL
    )


@torch.no_grad()
def test_rcablock_parity():
    tm = ref_blocks.RCABlock(16, 16, reduction=4, mode="CRC").eval()
    sd = tm.state_dict()
    params = {
        "params": {
            "conv1": {"kernel": convert.conv_w(sd["res.0.weight"]),
                      "bias": convert._np(sd["res.0.bias"])},
            "conv2": {"kernel": convert.conv_w(sd["res.2.weight"]),
                      "bias": convert._np(sd["res.2.bias"])},
            "ca": {"fc1": {"kernel": convert.conv_w(sd["ca.conv_fc.0.weight"]),
                           "bias": convert._np(sd["ca.conv_fc.0.bias"])},
                   "fc2": {"kernel": convert.conv_w(sd["ca.conv_fc.2.weight"]),
                           "bias": convert._np(sd["ca.conv_fc.2.bias"])}},
        }
    }
    fm = RCABlock(16, reduction=4)
    x = torch.randn(2, 16, 12, 12)
    np.testing.assert_allclose(
        nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x))), tm(x).numpy(), **TOL
    )


@torch.no_grad()
def test_rrdb_parity():
    tm = ref_blocks.RRDB(nc=16, gc=8, mode="CR").eval()
    sd = tm.state_dict()

    def rdb(prefix):
        out = {}
        for i in range(1, 5):
            out[f"conv{i}"] = {
                "kernel": convert.conv_w(sd[f"{prefix}.conv{i}.0.weight"]),
                "bias": convert._np(sd[f"{prefix}.conv{i}.0.bias"]),
            }
        out["conv5"] = {"kernel": convert.conv_w(sd[f"{prefix}.conv5.weight"]),
                        "bias": convert._np(sd[f"{prefix}.conv5.bias"])}
        return out

    params = {"params": {f"rdb{i+1}": rdb(f"RDB{i+1}") for i in range(3)}}
    fm = RRDB(16, gc=8)
    x = torch.randn(1, 16, 10, 10)
    np.testing.assert_allclose(
        nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x))), tm(x).numpy(), **TOL
    )


def test_rcagroup_shapes():
    import jax

    fm = RCAGroup(8, nb=2, reduction=4)
    x = jnp.zeros((1, 12, 12, 8))
    params = fm.init(jax.random.PRNGKey(0), x)
    assert fm.apply(params, x).shape == x.shape


@pytest.mark.parametrize("down", ["maxpool", "avgpool"])
@pytest.mark.parametrize("up", ["upconv", "pixelshuffle"])
def test_alternate_sampler_modes(down, up):
    """The reference conv factory's pooled/upconv/pixelshuffle sampler
    options (``basicblock.py:390-473``) keep U-Net shapes intact."""
    import jax

    fm = uv.UNet(out_nc=1, nc=(4, 6, 8, 10), nb=1,
                 downsample_mode=down, upsample_mode=up)
    x = jnp.zeros((1, 16, 16, 1))
    params = fm.init(jax.random.PRNGKey(0), x)
    assert fm.apply(params, x).shape == x.shape
