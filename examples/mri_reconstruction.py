"""End-to-end MRI reconstruction walkthrough (the framework's core task).

Reconstructs an undersampled single-coil acquisition three ways — ADMM-L1,
ADMM-CNC, and PnP with a model-zoo denoiser — and prints the PSNR ladder.
Mirrors the USAGE.md API section; runs on CPU or TPU.

    python examples/mri_reconstruction.py [--image path.png] [--model drunet_gray]
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
    p.add_argument("--mask", default="Q_Random30")
    p.add_argument("--model", default="drunet_gray")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.config import ADMMConfig
    from pnp_admm_cnc_mri_tpu.data import images, masks, noise
    from pnp_admm_cnc_mri_tpu.ops import fourier, metrics
    from pnp_admm_cnc_mri_tpu.priors import denoiser
    from pnp_admm_cnc_mri_tpu.solvers import admm, fista

    path = args.image or "/root/reference/testsets/set1/05.png"
    if os.path.exists(path):
        img = images.uint2single(images.modcrop(images.imread_gray(path)))
    else:  # synthetic phantom fallback
        yy, xx = np.mgrid[:256, :256]
        img = (((yy - 128) ** 2 + (xx - 128) ** 2) < 90**2).astype(np.float64)
        img *= 0.8 - 0.3 * (((yy - 110) ** 2 + 2 * (xx - 140) ** 2) < 40**2)

    try:
        mask = jnp.asarray(masks.load_mask(args.mask))
        n = jnp.asarray(noise.load_noise())
    except Exception:  # no reference assets: generate equivalents
        mask = jnp.asarray(masks.random_mask(img.shape, fraction=0.30))
        n = jnp.asarray(noise.synth_noise(img.shape))

    x0 = jnp.asarray(img, jnp.float32)
    y = fourier.observe(x0, mask, n)
    truth255 = x0 * 255.0

    def report(name, x):
        print(f"{name:>12}: {float(metrics.psnr(x * 255.0, truth255)):.2f} dB")

    report("zero-fill", jnp.abs(fourier.ifft2(y)))

    st, _ = admm.admm_l1(y, mask, ADMMConfig(iter_num=args.iters, lam=0.1,
                                             rho=0.015))
    report("ADMM-L1", st.x)

    st, _ = admm.admm_cnc(y, mask, ADMMConfig(iter_num=args.iters, lam=0.5,
                                              rho=0.05, alpha=0.45, b=64.0))
    report("ADMM-CNC", st.x)

    st, _ = fista.fista_l1(y, mask, iter_num=args.iters, lam=1e-4)
    report("FISTA-L1", st.x)

    weights = denoiser.resolve_weights(args.model)
    if weights:
        dn = denoiser.build_denoiser(args.model, weights=weights,
                                     iter_num=args.iters,
                                     noises=np.asarray(n))
        st, _ = admm.pnp_admm_l1(y, mask,
                                 ADMMConfig(iter_num=args.iters, rho=0.7),
                                 denoise=dn)
        report(f"PnP-{args.model}", st.x)
        # the gradient-form PnP family (best clean-weights quality;
        # solvers/fista.pnp_fista, TUNED_FISTA_D)
        st, _ = fista.pnp_fista(y, mask, args.iters, dn)
        report(f"FISTA-{args.model}", st.x)
    else:
        print(f"(no weights for {args.model}; skipping the PnP stage)")


if __name__ == "__main__":
    main()
