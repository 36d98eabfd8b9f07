"""Color BM3D demo (opponent-space, shared luminance matching).

Counterpart of the reference's ``bm3d307/examples/bm3d_demo_rgb.py`` on
the white-noise path.

    python examples/bm3d_rgb.py [--sigma 0.1] [--size 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_rgb(size: int) -> np.ndarray:
    lena = "/root/reference/bm3d307/examples/image_Lena512rgb.png"
    if os.path.exists(lena):
        try:
            from PIL import Image

            y = np.asarray(Image.open(lena), np.float64)[:size, :size] / 255.0
            if y.ndim == 3 and y.shape[2] >= 3:
                return y[..., :3]
        except Exception:
            pass
    yy, xx = np.mgrid[:size, :size] / size
    return np.stack([
        0.4 + 0.3 * np.sin(6 * yy),
        0.5 + 0.3 * np.cos(4 * xx),
        0.3 + 0.4 * ((yy + xx) % 0.3 > 0.15),
    ], axis=-1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sigma", type=float, default=0.1)
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
    y = load_rgb(args.size)
    z = y + args.sigma * rng.standard_normal(y.shape)

    y_est = np.asarray(api.bm3d_rgb(jnp.asarray(z, jnp.float32), args.sigma))

    def psnr(a, b):
        return 10 * np.log10(1.0 / np.mean((a - b) ** 2))

    print(f"noisy PSNR:    {psnr(z, y):.2f} dB")
    print(f"denoised PSNR: {psnr(y_est, y):.2f} dB")


if __name__ == "__main__":
    main()
