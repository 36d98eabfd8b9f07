"""Grayscale BM3D demo with spatially correlated noise.

TPU-native counterpart of the reference's
``bm3d307/examples/bm3d_demo_grayscale.py``: generate stationary colored
noise from one of the g* experiment kernels, denoise with the full PSD
(exact-variance colored core), report PSNR.

    python examples/bm3d_grayscale.py [--noise g3] [--var 0.02] [--size 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_scene(size: int) -> np.ndarray:
    """cameraman256 when the reference assets are mounted, else a synthetic
    piecewise scene."""
    cam = "/root/reference/bm3d307/examples/cameraman256.png"
    if os.path.exists(cam):
        from pnp_admm_cnc_mri_tpu.data import images

        y = images.imread_gray(cam).astype(np.float64) / 255.0
        return y[:size, :size]
    yy, xx = np.mgrid[:size, :size] / size
    y = 0.3 + 0.4 * (np.sin(7 * yy) * np.cos(5 * xx) > 0)
    y[size // 4: size // 2, size // 4: size // 2] += 0.2
    return y


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--noise", default="g3",
                   help="gw/g0/g1/g2/g3/g4 or g1w..g4w (experiment kernels)")
    p.add_argument("--var", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--tpu", action="store_true",
                   help="use the default (TPU) backend instead of CPU")
    args = p.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.data import noise as noise_mod
    from pnp_admm_cnc_mri_tpu.priors.bm3d import api

    y = load_scene(args.size)
    kernel = noise_mod.get_experiment_kernel(args.noise, args.var,
                                             (args.size, args.size))
    n = noise_mod.synth_colored_noise(y.shape, kernel, seed=args.seed)
    psd = np.abs(np.fft.fft2(kernel, y.shape)) ** 2 * y.size
    z = y + n

    y_est = np.asarray(api.bm3d(jnp.asarray(z, jnp.float32), psd))

    def psnr(a, b):
        return 10 * np.log10(1.0 / np.mean((a - b) ** 2))

    print(f"noise={args.noise} var={args.var}")
    print(f"noisy PSNR:    {psnr(z, y):.2f} dB")
    print(f"denoised PSNR: {psnr(y_est, y):.2f} dB")


if __name__ == "__main__":
    main()
