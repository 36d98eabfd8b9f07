"""Multichannel BM3D demo: block matching on the first channel only.

Counterpart of the reference's
``bm3d307/examples/bm3d_demo_multichannel.py`` (BrainWeb slice stack when
the reference assets are mounted; synthetic channels otherwise).

    python examples/bm3d_multichannel.py [--sigma 0.14] [--size 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.bm3d_grayscale import load_scene  # noqa: E402


def load_channels(size: int) -> np.ndarray:
    mat = "/root/reference/bm3d307/examples/brainslice.mat"
    if os.path.exists(mat):
        import scipy.io as sio

        y = np.asarray(sio.loadmat(mat)["slice_sample"], np.float64)
        y = y / max(y.max(), 1e-9)
        return y[:size, :size]
    base = load_scene(size)
    return np.stack([base, 0.6 * base + 0.2, 1.0 - base], axis=-1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sigma", type=float, default=0.14)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tpu", action="store_true",
                   help="use the default (TPU) backend instead of CPU")
    args = p.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.priors.bm3d import api

    rng = np.random.default_rng(args.seed)
    y = load_channels(args.size)
    z = y + args.sigma * rng.standard_normal(y.shape)

    y_est = np.asarray(
        api.bm3d_multichannel(jnp.asarray(z, jnp.float32), args.sigma)
    )

    def psnr(a, b):
        return 10 * np.log10(np.ptp(y) ** 2 / np.mean((a - b) ** 2))

    print(f"channels: {y.shape[-1]}")
    print(f"noisy PSNR:    {psnr(z, y):.2f} dB")
    print(f"denoised PSNR: {psnr(y_est, y):.2f} dB")


if __name__ == "__main__":
    main()
