"""BM3D deblurring demo (regularized inverse + colored-residual BM3D).

Counterpart of the reference's ``bm3d307/examples/bm3d_demo_deblurring.py``
experiment 4 (separable [1,4,6,4,1] blur, sigma = 7/255).

    python examples/bm3d_deblurring.py [--size 128]
"""

import argparse
import os
import sys

import numpy as np
from scipy.ndimage import correlate

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.bm3d_grayscale import load_scene  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
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

    y = load_scene(args.size)
    v = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float64)
    v /= v.sum()
    sigma = 7.0 / 255.0

    rng = np.random.default_rng(args.seed)
    z = correlate(y, v, mode="wrap") + sigma * rng.standard_normal(y.shape)

    y_est = np.asarray(
        api.bm3d_deblurring(jnp.asarray(z, jnp.float32), sigma,
                            jnp.asarray(v, jnp.float32))
    )

    def psnr(a, b):
        return 10 * np.log10(1.0 / np.mean((a - b) ** 2))

    print(f"blurred+noisy PSNR: {psnr(z, y):.2f} dB")
    print(f"deblurred PSNR:     {psnr(y_est, y):.2f} dB")


if __name__ == "__main__":
    main()
