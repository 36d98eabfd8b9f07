"""Denoiser parity: Flax reimplementations vs the reference torch models.

The strongest oracle available without pretrained weights: instantiate the
ACTUAL reference torch modules (imported read-only from /root/reference)
with random weights, convert the state-dict with ``models.convert``, and
require allclose outputs. This validates both the architecture transcription
and the weight converter, which is exactly what matters once real KAIR
checkpoints are supplied.
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

ref_models = pytest.importorskip("models.network_dncnn")

from pnp_admm_cnc_mri_tpu.models import convert  # noqa: E402
from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN, FDnCNN, IRCNN  # noqa: E402
from pnp_admm_cnc_mri_tpu.models.drunet import UNetRes  # noqa: E402
from pnp_admm_cnc_mri_tpu.models.ffdnet import FFDNet  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-5)


def nchw_to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def nhwc_to_nchw(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@torch.no_grad()
def test_dncnn_parity():
    tm = ref_models.DnCNN(in_nc=1, out_nc=1, nc=16, nb=6, act_mode="R").eval()
    params = convert.convert_dncnn(tm.state_dict(), nb=6)
    fm = DnCNN(out_nc=1, nc=16, nb=6)

    x = torch.randn(2, 1, 24, 24)
    want = tm(x).numpy()
    got = nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x)))
    np.testing.assert_allclose(got, want, **TOL)


@torch.no_grad()
def test_fdncnn_parity():
    tm = ref_models.FDnCNN(in_nc=2, out_nc=1, nc=16, nb=5, act_mode="R").eval()
    params = convert.convert_fdncnn(tm.state_dict(), nb=5)
    fm = FDnCNN(out_nc=1, nc=16, nb=5)

    x = torch.randn(1, 2, 20, 20)
    want = tm(x).numpy()
    got = nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x)))
    np.testing.assert_allclose(got, want, **TOL)


@torch.no_grad()
def test_ircnn_parity():
    tm = ref_models.IRCNN(in_nc=1, out_nc=1, nc=12).eval()
    params = convert.convert_ircnn(tm.state_dict())
    fm = IRCNN(out_nc=1, nc=12)

    x = torch.randn(1, 1, 32, 32)
    want = tm(x).numpy()
    got = nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x)))
    np.testing.assert_allclose(got, want, **TOL)


@torch.no_grad()
def test_ircnn_bundle_stacking():
    bundles = {}
    sds = []
    for i in range(25):
        m = ref_models.IRCNN(in_nc=1, out_nc=1, nc=4)
        bundles[str(i)] = m.state_dict()
        sds.append(m)
    stacked = convert.convert_ircnn_bundle(bundles)
    fm = IRCNN(out_nc=1, nc=4)
    x = torch.randn(1, 1, 16, 16)
    import jax

    for idx in [0, 7, 24]:
        params = jax.tree.map(lambda a: a[idx], stacked)
        want = sds[idx].eval()(x).detach().numpy()
        got = nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x)))
        np.testing.assert_allclose(got, want, **TOL)


@torch.no_grad()
@pytest.mark.parametrize("hw", [(24, 24), (17, 19)])
def test_ffdnet_parity(hw):
    import models.network_ffdnet as ref_ffdnet

    tm = ref_ffdnet.FFDNet(in_nc=1, out_nc=1, nc=12, nb=5, act_mode="R").eval()
    params = convert.convert_ffdnet(tm.state_dict(), nb=5)
    fm = FFDNet(out_nc=1, nc=12, nb=5)

    x = torch.randn(2, 1, *hw)
    sigma = torch.full((2, 1, 1, 1), 15.0 / 255.0)
    want = tm(x, sigma).numpy()
    got = nhwc_to_nchw(
        fm.apply(params, nchw_to_nhwc(x), jnp.full((2, 1, 1, 1), 15.0 / 255.0))
    )
    np.testing.assert_allclose(got, want, **TOL)


@torch.no_grad()
def test_drunet_parity():
    import models.network_unet as ref_unet

    tm = ref_unet.UNetRes(
        in_nc=2, out_nc=1, nc=[4, 8, 16, 32], nb=2, act_mode="R",
        downsample_mode="strideconv", upsample_mode="convtranspose",
    ).eval()
    params = convert.convert_drunet(tm.state_dict(), nb=2)
    fm = UNetRes(out_nc=1, nc=(4, 8, 16, 32), nb=2)

    x = torch.randn(1, 2, 32, 32)
    want = tm(x).numpy()
    got = nhwc_to_nchw(fm.apply(params, nchw_to_nhwc(x)))
    np.testing.assert_allclose(got, want, **TOL)


@torch.no_grad()
def test_npz_round_trip(tmp_path):
    tm = ref_models.DnCNN(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R").eval()
    params = convert.convert_dncnn(tm.state_dict(), nb=5)
    p = str(tmp_path / "w.npz")
    convert.save_npz(params, p)
    loaded = convert.load_npz(p)
    fm = DnCNN(out_nc=1, nc=8, nb=5)
    x = torch.randn(1, 1, 16, 16)
    a = fm.apply(params, nchw_to_nhwc(x))
    b = fm.apply(loaded, nchw_to_nhwc(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


class TestDescribe:
    def test_describe_model_counts_and_lists(self):
        import jax
        import jax.numpy as jnp
        from pnp_admm_cnc_mri_tpu.models import describe
        from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN

        fm = DnCNN(out_nc=1, nc=8, nb=4)
        params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        n = describe.num_params(params)
        assert n == sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        msg = describe.describe_model(params, "DnCNN")
        assert "models name: DnCNN" in msg
        assert f"Params number: {n}" in msg
        assert "head" in msg and "tail" in msg

    def test_describe_params_stats_table(self):
        import numpy as np
        from pnp_admm_cnc_mri_tpu.models import describe

        params = {"w": np.array([1.0, 2.0, 3.0]), "b": np.zeros((2,))}
        msg = describe.describe_params(params)
        # torch-style unbiased std: std([1,2,3], ddof=1) == 1.0
        assert " |  2.000 |  1.000 |  3.000 |  1.000 || w" in msg
        assert "param_name" in msg


class TestTDNet:
    """TDNet (models/tdnet.py) — the MXU-shaped prior for the non-parity
    pipelines (no reference counterpart; VERDICT r2 #4)."""

    def test_shapes_including_odd(self):
        import jax
        import jax.numpy as jnp

        from pnp_admm_cnc_mri_tpu.models.tdnet import TDNet

        m = TDNet(nc=16, nb=4)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                   jnp.asarray(0.1))
        for shape in [(2, 32, 32, 1), (1, 33, 31, 1)]:
            out = m.apply(p, jnp.ones(shape) * 0.5, jnp.asarray(0.1))
            assert out.shape == shape

    def test_residual_structure(self):
        """Output = input - PixelShuffle(net): with the tail conv zeroed
        the model is the identity."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pnp_admm_cnc_mri_tpu.models.tdnet import TDNet

        m = TDNet(nc=16, nb=4)
        x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 1)),
                        jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x, jnp.asarray(0.1))
        zeroed = jax.tree_util.tree_map_with_path(
            lambda path, a: jnp.zeros_like(a)
            if any(getattr(k, "key", None) == "tail" for k in path) else a,
            p)
        out = m.apply(zeroed, x, jnp.asarray(0.1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_sigma_conditioning_changes_output(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pnp_admm_cnc_mri_tpu.models.tdnet import TDNet

        m = TDNet(nc=16, nb=4)
        x = jnp.ones((1, 16, 16, 1)) * 0.5
        p = m.init(jax.random.PRNGKey(1), x, jnp.asarray(0.1))
        a = m.apply(p, x, jnp.asarray(0.05))
        b = m.apply(p, x, jnp.asarray(0.45))
        assert float(jnp.abs(a - b).max()) > 1e-6

    def test_adapter_ladder_and_batch_axes(self):
        import jax.numpy as jnp
        import warnings

        from pnp_admm_cnc_mri_tpu.priors import denoiser as dn

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            d = dn.build_denoiser("tdnet", nc=16, nb=4, iter_num=8)
        v = jnp.ones((3, 2, 24, 24)) * 0.5  # folded leading axes
        out = d(v, 2)
        assert out.shape == v.shape

    def test_adapter_x8_ensemble_averages_dihedral_orbit(self):
        """x8=True must equal the hand-rolled 8-transform average of the
        plain adapter (same params), and differ from it on asymmetric
        input — mirrors the drunet adapter's x8 contract."""
        import warnings

        import jax
        import jax.numpy as jnp
        import numpy as np

        from pnp_admm_cnc_mri_tpu.priors import denoiser as dn

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            plain = dn.build_denoiser("tdnet", nc=16, nb=4, iter_num=8)
            # same seed => same random params for both adapters
            ens = dn.build_denoiser("tdnet", nc=16, nb=4, iter_num=8,
                                    x8=True)
        v = jnp.asarray(
            np.random.default_rng(0).random((1, 24, 24)), jnp.float32)
        want = sum(
            dn._augment(
                plain(dn._augment(v, m, axes=(-2, -1)), 3),
                int(dn.INVERSE_MODE[m]), axes=(-2, -1))
            for m in range(8)
        ) / 8.0
        got = ens(v, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5)
        assert float(jnp.abs(got - plain(v, 3)).max()) > 1e-6
