"""Denoiser-prior adapters: augment semantics, end-to-end PnP parity."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
if os.path.isdir(os.path.join(REF, "models")):
    sys.path.insert(0, REF)

from pnp_admm_cnc_mri_tpu.config import ADMMConfig  # noqa: E402
from pnp_admm_cnc_mri_tpu.models import convert  # noqa: E402
from pnp_admm_cnc_mri_tpu.priors import denoiser as dn  # noqa: E402
from pnp_admm_cnc_mri_tpu.solvers import admm  # noqa: E402


class TestAugment:
    def test_matches_reference_tensor4(self, rng):
        """Our (..., H, W) dihedral modes must equal augment_img_tensor4."""
        import types

        if "torchvision" not in sys.modules:  # reference imports make_grid
            tv = types.ModuleType("torchvision")
            tvu = types.ModuleType("torchvision.utils")
            tvu.make_grid = lambda *a, **k: None
            tv.utils = tvu
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.utils"] = tvu
        sys.path.insert(0, REF)
        from utils import utils_image as ref_util

        x = rng.random((1, 1, 8, 8)).astype(np.float32)
        for mode in range(8):
            want = ref_util.augment_img_tensor4(torch.from_numpy(x), mode).numpy()
            got = np.asarray(dn._augment(jnp.asarray(x), mode))
            np.testing.assert_array_equal(got, want, err_msg=f"mode {mode}")

    def test_inverse_property(self, rng):
        x = jnp.asarray(rng.random((2, 8, 8)))
        for mode in range(8):
            inv = int(dn.INVERSE_MODE[mode])
            np.testing.assert_allclose(
                np.asarray(dn._augment(dn._augment(x, mode), inv)), np.asarray(x)
            )

    def test_traced_switch(self, rng):
        x = jnp.asarray(rng.random((2, 8, 8)).astype(np.float32))
        for mode in range(8):
            np.testing.assert_array_equal(
                np.asarray(dn.augment(x, jnp.asarray(mode))),
                np.asarray(dn._augment(x, mode)),
            )


@pytest.mark.parametrize(
    "name", ["dncnn_15", "fdncnn_gray", "ircnn_gray", "ffdnet_gray", "drunet_gray"]
)
def test_adapter_runs_in_jitted_loop(name, rng):
    """Every adapter must compile and run inside the scanned solver."""
    noises = 0.5 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
    denoise = dn.build_denoiser(name, iter_num=4, noises=noises)
    img = rng.random((2, 32, 32))
    mask = (rng.random((32, 32)) < 0.4).astype(np.float64)
    y = (np.fft.fft2(img, axes=(-2, -1)) * mask + noises).astype(np.complex64)
    cfg = ADMMConfig(iter_num=4, rho=0.25)
    final, _ = admm.pnp_admm_l1(
        jnp.asarray(y), jnp.asarray(mask, jnp.float32), cfg, denoise, dtype=jnp.float32
    )
    assert final.x.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(final.x)).all()
    assert (np.asarray(final.x) >= 0).all() and (np.asarray(final.x) <= 1).all()


@torch.no_grad()
def test_pnp_dncnn_end_to_end_parity(rng):
    """Full PnP-ADMM-L1 with a real (random-weight) DnCNN vs a transcription
    of the reference loop (【3】:255-296) running the torch model."""
    import models.network_dncnn as ref_models

    tm = ref_models.DnCNN(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R").eval()
    params = convert.convert_dncnn(tm.state_dict(), nb=5)

    from pnp_admm_cnc_mri_tpu.models.dncnn import DnCNN

    fm = DnCNN(out_nc=1, nc=8, nb=5)

    img = rng.random((32, 32))
    mask = (rng.random((32, 32)) < 0.4).astype(np.float64)
    noise = 0.5 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
    y = np.fft.fft2(img) * mask + noise
    iter_num, rho = 8, 0.15

    # --- reference-style loop: numpy x-update + torch denoiser + clamps ---
    index = np.nonzero(mask)
    la2 = 1.0 / 2.0 / rho
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    for i in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        v = torch.from_numpy((x + w)[None, None]).float()
        z = tm(v).numpy()[0, 0].astype(np.float64)
        w = w + x - z
        x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)

    # --- ours: same math fully jitted at f32 ---
    def denoise(v, i):
        b, restore = dn._as_nhwc(v)
        return restore(fm.apply(params, b))

    cfg = ADMMConfig(iter_num=iter_num, rho=rho)
    final, _ = admm.pnp_admm_l1(
        jnp.asarray(y, jnp.complex64),
        jnp.asarray(mask, jnp.float32),
        cfg,
        denoise,
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(final.x), x, rtol=5e-3, atol=5e-4)


@torch.no_grad()
def test_pnp_ircnn_sigma_bundle_end_to_end_parity(rng):
    """IRCNN: our stacked-weights + on-device gather must equal the
    reference's per-iteration load_state_dict swap (【3】:280-288)."""
    import models.network_dncnn as ref_models

    from pnp_admm_cnc_mri_tpu.models import convert
    from pnp_admm_cnc_mri_tpu.ops import schedules

    nc = 8
    torch_models = []
    bundle = {}
    for i in range(25):
        m = ref_models.IRCNN(in_nc=1, out_nc=1, nc=nc).eval()
        torch_models.append(m)
        bundle[str(i)] = m.state_dict()
    stacked = convert.convert_ircnn_bundle(bundle)

    img = rng.random((32, 32))
    mask = (rng.random((32, 32)) < 0.4).astype(np.float64)
    noise = 0.4 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
    y = np.fft.fft2(img) * mask + noise
    iter_num, rho = 8, 0.145
    nlm = 15.0 / 255.0
    _, sigmas = schedules.get_rho_sigma(
        sigma=max(0.255 / 255.0, nlm), iter_num=iter_num,
        model_sigma1=49.0, model_sigma2=nlm * 255.0,
    )
    idx = schedules.ircnn_sigma_indices(sigmas)

    # reference-style loop with per-iteration model swap
    index = np.nonzero(mask)
    la2 = 1.0 / 2.0 / rho
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    for i in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        v = torch.from_numpy((x + w)[None, None]).float()
        z = torch_models[int(idx[i])](v).numpy()[0, 0].astype(np.float64)
        w = w + x - z
        x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)

    # ours, fully jitted with the stacked gather
    denoise = dn.build_denoiser("ircnn_gray", iter_num=iter_num, nc=nc, params=stacked)
    cfg = ADMMConfig(iter_num=iter_num, rho=rho)
    final, _ = admm.pnp_admm_l1(
        jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32), cfg,
        denoise, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(final.x), x, rtol=5e-3, atol=5e-4)


@torch.no_grad()
def test_pnp_drunet_sigma_map_end_to_end_parity(rng):
    """DRUNet: sigma-ladder map conditioning inside the loop matches the
    reference denoising_step1 drunet branch (x8 off, plain forward)."""
    import models.network_unet as ref_unet

    from pnp_admm_cnc_mri_tpu.models import convert
    from pnp_admm_cnc_mri_tpu.ops import schedules

    tm = ref_unet.UNetRes(
        in_nc=2, out_nc=1, nc=[4, 8, 16, 32], nb=2, act_mode="R",
        downsample_mode="strideconv", upsample_mode="convtranspose",
    ).eval()
    params = convert.convert_drunet(tm.state_dict(), nb=2)

    img = rng.random((32, 32))
    mask = (rng.random((32, 32)) < 0.4).astype(np.float64)
    noise = 0.4 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
    y = np.fft.fft2(img) * mask + noise
    iter_num, rho = 6, 0.26
    nlm = 15.0 / 255.0
    _, sigmas = schedules.get_rho_sigma(
        sigma=max(0.255 / 255.0, nlm), iter_num=iter_num,
        model_sigma1=49.0, model_sigma2=nlm * 255.0,
    )

    index = np.nonzero(mask)
    la2 = 1.0 / 2.0 / rho
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    for i in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        v = torch.from_numpy((x + w)[None, None]).float()
        sm = torch.full((1, 1, 32, 32), float(sigmas[i]))
        z = tm(torch.cat([v, sm], dim=1)).numpy()[0, 0].astype(np.float64)
        w = w + x - z
        x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)

    denoise = dn.build_denoiser("drunet_gray", iter_num=iter_num, nc=4, nb=2,
                                params=params, x8=False)
    cfg = ADMMConfig(iter_num=iter_num, rho=rho)
    final, _ = admm.pnp_admm_l1(
        jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32), cfg,
        denoise, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(final.x), x, rtol=5e-3, atol=1e-3)


@torch.no_grad()
def test_pnp_ffdnet_end_to_end_parity(rng):
    """FFDNet: sigma-argument conditioning matches the reference branch."""
    import models.network_ffdnet as ref_ffdnet

    from pnp_admm_cnc_mri_tpu.models import convert

    tm = ref_ffdnet.FFDNet(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R").eval()
    params = convert.convert_ffdnet(tm.state_dict(), nb=5)

    img = rng.random((32, 32))
    mask = (rng.random((32, 32)) < 0.4).astype(np.float64)
    noise = 0.4 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
    y = np.fft.fft2(img) * mask + noise
    iter_num, rho = 6, 0.25
    nlm = 15.0

    index = np.nonzero(mask)
    la2 = 1.0 / 2.0 / rho
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    for i in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        v = torch.from_numpy((x + w)[None, None]).float()
        sig = torch.full((1, 1, 1, 1), nlm / 255.0)
        z = tm(v, sig).numpy()[0, 0].astype(np.float64)
        w = w + x - z
        x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)

    denoise = dn.build_denoiser("ffdnet_gray", nc=8, nb=5, params=params,
                                noise_level_model=nlm)
    cfg = ADMMConfig(iter_num=iter_num, rho=rho)
    final, _ = admm.pnp_admm_l1(
        jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32), cfg,
        denoise, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(final.x), x, rtol=5e-3, atol=5e-4)


@torch.no_grad()
def test_pnp_cnc_dncnn_pair_end_to_end_parity(rng):
    """The two-checkpoint CNC-DnCNN variant (【6】:372,517-519): two
    different DnCNN models in the s and z slots."""
    import models.network_dncnn as ref_models

    from pnp_admm_cnc_mri_tpu.models import convert

    tm1 = ref_models.DnCNN(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R").eval()
    tm2 = ref_models.DnCNN(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R").eval()
    p1 = convert.convert_dncnn(tm1.state_dict(), nb=5)
    p2 = convert.convert_dncnn(tm2.state_dict(), nb=5)

    img = rng.random((32, 32))
    mask = (rng.random((32, 32)) < 0.4).astype(np.float64)
    noise = 0.4 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
    y = np.fft.fft2(img) * mask + noise
    iter_num = 6
    a, rho, lam, b = 1.2, 0.45, 4.0, 0.3

    index = np.nonzero(mask)
    la2 = 1.0 / 2.0 / rho
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    for i in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        zt = torch.from_numpy(z[None, None]).float()
        s = tm1(zt).numpy()[0, 0].astype(np.float64)
        t = (1 - a) * z + a * (x + w) + a * rho * lam * b * (z - s)
        tt = torch.from_numpy(t[None, None]).float()
        z = tm2(tt).numpy()[0, 0].astype(np.float64)
        w = w + x - z
        x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)

    d1 = dn.build_denoiser("dncnn_25", nc=8, nb=5, params=p1)
    d2 = dn.build_denoiser("dncnn_15", nc=8, nb=5, params=p2)
    cfg = ADMMConfig(iter_num=iter_num, alpha=a, rho=rho, lam=lam, b=b)
    final, _ = admm.pnp_admm_cnc(
        jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32), cfg,
        d1, d2, clamp=True, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(final.x), x, rtol=5e-3, atol=5e-4)


@torch.no_grad()
def test_pnp_drunet_x8_cycling_end_to_end_parity(rng):
    """DRUNet x8=True path: per-iteration cycling dihedral augmentation
    around the sigma-conditioned forward (【3】:39-50)."""
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu

    import models.network_unet as ref_unet
    from utils import utils_image as ref_util

    from pnp_admm_cnc_mri_tpu.models import convert
    from pnp_admm_cnc_mri_tpu.ops import schedules

    tm = ref_unet.UNetRes(
        in_nc=2, out_nc=1, nc=[4, 8, 16, 32], nb=2, act_mode="R",
        downsample_mode="strideconv", upsample_mode="convtranspose",
    ).eval()
    params = convert.convert_drunet(tm.state_dict(), nb=2)

    img = rng.random((32, 32))
    mask = (rng.random((32, 32)) < 0.4).astype(np.float64)
    noise = 0.4 * (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32)))
    y = np.fft.fft2(img) * mask + noise
    iter_num, rho = 10, 0.26  # > 8 so the augment cycle wraps
    nlm = 15.0 / 255.0
    _, sigmas = schedules.get_rho_sigma(
        sigma=max(0.255 / 255.0, nlm), iter_num=iter_num,
        model_sigma1=49.0, model_sigma2=nlm * 255.0,
    )

    index = np.nonzero(mask)
    la2 = 1.0 / 2.0 / rho
    x = np.abs(np.fft.ifft2(y))
    z = x.copy()
    w = np.zeros_like(x)
    for i in range(iter_num):
        xf = np.fft.fft2(z - w)
        xf[index] = (la2 * xf[index] + y[index]) / (1.0 + la2)
        x = np.abs(np.real(np.fft.ifft2(xf)))
        v = torch.from_numpy((x + w)[None, None]).float()
        v = ref_util.augment_img_tensor4(v, i % 8)
        sm = torch.full((1, 1, 32, 32), float(sigmas[i]))
        out = tm(torch.cat([v, sm], dim=1))
        if i % 8 == 3 or i % 8 == 5:
            out = ref_util.augment_img_tensor4(out, 8 - i % 8)
        else:
            out = ref_util.augment_img_tensor4(out, i % 8)
        z = out.numpy()[0, 0].astype(np.float64)
        w = w + x - z
        x, z, w = x.clip(0, 1), z.clip(0, 1), w.clip(0, 1)

    denoise = dn.build_denoiser("drunet_gray", iter_num=iter_num, nc=4, nb=2,
                                params=params, x8=True)
    cfg = ADMMConfig(iter_num=iter_num, rho=rho)
    final, _ = admm.pnp_admm_l1(
        jnp.asarray(y, jnp.complex64), jnp.asarray(mask, jnp.float32), cfg,
        denoise, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(final.x), x, rtol=5e-3, atol=1e-3)


def test_rescaled_denoiser_matches_reference_wrapper(rng):
    """priors.denoiser.rescaled_denoiser vs a transcription of the
    reference Denoisingstep (utils/utils.py:20-47)."""
    x = rng.random((24, 24)) * 0.7 + 0.1
    sigma = 15.0

    def residual_np(v):  # pretend-residual model: 0.1 * blur-ish map
        return 0.1 * np.tanh(v)

    mintmp, maxtmp = x.min(), x.max()
    xt = (x - mintmp) / (maxtmp - mintmp)
    scale_range = 1.0 + sigma / 255.0 / 2.0
    scale_shift = (1 - scale_range) / 2.0
    xt = xt * scale_range + scale_shift
    out = xt - residual_np(xt)
    out = (out - scale_shift) / scale_range
    want = out * (maxtmp - mintmp) + mintmp

    den = dn.rescaled_denoiser(lambda v: 0.1 * jnp.tanh(v), sigma)
    got = np.asarray(den(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_bf16_compute_dtype_close_to_f32(rng):
    """compute_dtype=bfloat16 adapters must track the f32 path closely."""
    import models.network_dncnn as ref_models

    tm = ref_models.DnCNN(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R").eval()
    params = convert.convert_dncnn(tm.state_dict(), nb=5)

    d32 = dn.build_denoiser("dncnn_15", nc=8, nb=5, params=params)
    d16 = dn.build_denoiser("dncnn_15", nc=8, nb=5, params=params,
                            compute_dtype=jnp.bfloat16)
    v = jnp.asarray(rng.random((2, 32, 32)).astype(np.float32))
    a = np.asarray(d32(v, 0))
    b = np.asarray(d16(v, 0))
    assert b.dtype == np.float32  # output restored to the solver dtype
    assert np.abs(a - b).max() < 0.03, np.abs(a - b).max()
