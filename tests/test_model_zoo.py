"""Shipped model_zoo checkpoints: resolution and denoising quality.

The reference expects KAIR ``.pth`` checkpoints in ``model_zoo/``
(``【3】PNP_ADMM_L1_D  .py:102``); those are not redistributable, so this
framework ships self-trained ``.npz`` weights. These tests pin (a) the
``resolve_weights`` lookup used by the CLIs and (b) that every shipped
checkpoint actually denoises (guards against committing a broken/
random-init npz — a silent 7 dB failure mode we hit once).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_admm_cnc_mri_tpu.priors import denoiser as dn

ZOO = dn.DEFAULT_MODEL_ZOO
SHIPPED = [
    name for name in ("dncnn_15", "dncnn_25", "dncnn_15_no05",
                      "fdncnn_gray", "ffdnet_gray", "ircnn_gray",
                      "drunet_gray")
    if os.path.exists(os.path.join(ZOO, name + ".npz"))
]


class TestResolveWeights:
    def test_explicit_path_wins(self, tmp_path):
        p = str(tmp_path / "w.npz")
        assert dn.resolve_weights("dncnn_15", p) == p

    def test_zoo_lookup(self):
        got = dn.resolve_weights("dncnn_15")
        assert got is not None and got.endswith("dncnn_15.npz")

    def test_unknown_returns_none(self):
        assert dn.resolve_weights("no_such_model_xyz") is None

    def test_random_fallback_warns(self):
        with pytest.warns(UserWarning, match="RANDOM"):
            dn.build_denoiser("dncnn_15", nc=8, nb=3)


@pytest.mark.parametrize("name", SHIPPED)
def test_shipped_checkpoint_denoises(name):
    """Every committed npz must beat the noisy input by >=5 dB at sigma=15
    on a smooth synthetic scene (random-init nets *add* noise here).

    Evaluated at the LAST schedule index so the sigma-ladder models
    (drunet/ircnn) see their matched endpoint sigma rather than the
    ladder start (49/255 — 3x the actual noise, where margins say more
    about the schedule than the checkpoint). noise_level_model is on
    [0,1] for drunet/ircnn and [0,255] for ffdnet (build_denoiser
    convention)."""
    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.arange(96), np.arange(96))
    x = (0.5 + 0.25 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.float32)
    z = x + rng.normal(0, 15 / 255.0, x.shape).astype(np.float32)

    nlm = 15.0 if ("ffdnet" in name or "fdncnn" in name) else 15.0 / 255.0
    denoise = dn.build_denoiser(name, weights=dn.resolve_weights(name),
                                noise_level_model=nlm,
                                noises=np.full(x.shape, 15.0, np.complex128))
    y = np.asarray(denoise(jnp.asarray(z)[None], 49))[0]

    def psnr(a):
        return 10 * np.log10(1.0 / np.mean((a - x) ** 2))

    assert psnr(y) > psnr(z) + 5.0, (name, psnr(y), psnr(z))
