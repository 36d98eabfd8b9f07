"""Plug-and-play super-resolution / deblurring with the closed-form solve.

Demonstrates the ``ops/sisr`` forward models (capability parity with the
reference's vendored ``utils/utils_sisr.py``, which cannot run on modern
torch): degrade a ground-truth image with an anisotropic Gaussian blur +
sf-fold decimation, then reconstruct it HQS-style, alternating the
frequency-domain data solution (``sisr.data_solution``) with a model-zoo
denoiser prior — the DPIR recipe on the framework's own stack.

    python examples/super_resolution.py [--sf 2] [--model drunet_gray] [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None, help="grayscale PNG (defaults "
                   "to the reference testset's 05.png when mounted)")
    p.add_argument("--sf", type=int, default=2, help="downscale factor")
    p.add_argument("--model", default="drunet_gray")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.data import images
    from pnp_admm_cnc_mri_tpu.ops import metrics, schedules, sisr
    from pnp_admm_cnc_mri_tpu.priors import denoiser as dn

    path = args.image or os.path.join(images.DEFAULT_TESTSETS, "set1", "05.png")
    truth_u8 = images.modcrop(images.imread_gray(path), args.sf * 8)
    x_true = jnp.asarray(images.uint2single(truth_u8))

    # Forward model: anisotropic Gaussian blur + sf-fold decimation
    # (sisr.classical_degradation), plus mild Gaussian noise.
    k = sisr.anisotropic_gaussian(ksize=9, theta=0.7, l1=2.5, l2=1.0)
    kj = jnp.asarray(k)
    y = sisr.classical_degradation(x_true, kj, args.sf)
    y = y + 1.5 / 255.0 * jax.random.normal(jax.random.PRNGKey(0), y.shape)

    # Zero-fill baseline: nearest-style upsample of the LR observation.
    x0 = jnp.kron(y, jnp.ones((args.sf, args.sf), y.dtype))
    psnr0 = float(metrics.psnr(x0 * 255.0, jnp.asarray(truth_u8, jnp.float32)))

    # HQS: x-update = closed-form data solution, z-update = denoiser.
    # ONE get_rho_sigma ladder (utils_pnp.py:14-23) drives both the rho
    # weights and the denoiser's sigma conditioning — the DPIR recipe
    # (modelSigma2 = max(sf, noise*255)); a mismatched pair over-smooths.
    nlm = float(max(args.sf, 1.5))
    denoise = dn.build_denoiser(args.model, iter_num=args.iters,
                                weights=dn.resolve_weights(args.model),
                                noise_level_model=dn.nlm_for_model(args.model, nlm))
    fb, fbc, f2b, fbfy = sisr.pre_calculate(y, kj, args.sf)
    rhos, _sigmas = schedules.get_rho_sigma(sigma=1.5 / 255.0,
                                            iter_num=args.iters,
                                            model_sigma2=nlm)

    z = x0
    for i in range(args.iters):
        x = sisr.data_solution(z, fb, fbc, f2b, fbfy, float(rhos[i]), args.sf)
        z = jnp.clip(denoise(x, i), 0.0, 1.0)

    psnr = float(metrics.psnr(z * 255.0, jnp.asarray(truth_u8, jnp.float32)))
    print(f"x{args.sf} SR with {args.model}: zero-fill {psnr0:.2f} dB -> "
          f"PnP {psnr:.2f} dB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
