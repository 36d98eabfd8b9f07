"""Probe: can any matmul re-formulation beat XLA's direct conv at nc=64?

The DnCNN-shape conv (3x3, 64->64 channels) measures ~21% of MXU peak as a
direct NHWC conv (conv_roofline_probe.py) because 64 output channels only
half-fill the 128 MXU lanes. Candidate rewrites:

  A. direct NHWC conv (baseline)
  B. direct NCHW conv (layout choice left to XLA)
  C. im2col + matmul, output (pixels, c_out)  — lanes = c_out = 64
  D. im2col + matmul, output (c_out, pixels)  — lanes = pixels (full 128)

im2col pays 9x input traffic (B*HW*9C bf16), so C/D are bandwidth-bound at
~0.74 ms/layer for B=8 256^2 — the probe tells whether that still beats
the 21%-peak direct kernel (~0.98 ms/layer).

Run on the TPU chip: python scripts/conv_formulation_probe.py
Axon rules: data on device, scalar-fetch timing, args not closures.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=5, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(out).astype(jnp.float32))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    b, h, w, nc, nb = 8, 256, 256, 64, 16
    key = jax.random.PRNGKey(0)
    peak = 197e12
    flops = 2 * b * h * w * 9 * nc * nc * nb

    x = jax.random.normal(key, (b, h, w, nc), jnp.bfloat16)
    ws = jax.random.normal(key, (nb, 3, 3, nc, nc), jnp.bfloat16) * 0.01

    def direct_nhwc(x, ws):
        for i in range(nb):
            x = jax.lax.conv_general_dilated(
                x, ws[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            x = jnp.maximum(x, 0)
        return x

    def direct_nchw(x, ws):
        x = jnp.transpose(x, (0, 3, 1, 2))
        for i in range(nb):
            x = jax.lax.conv_general_dilated(
                x, jnp.transpose(ws[i], (3, 2, 0, 1)), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.bfloat16)
            x = jnp.maximum(x, 0)
        return jnp.transpose(x, (0, 2, 3, 1))

    def _im2col(x):
        # (B, H, W, C) -> (B*H*W, 9C) patches, zero-padded SAME
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)]
        return jnp.concatenate(cols, axis=-1).reshape(b * h * w, 9 * nc)

    def im2col_pix_rows(x, ws):
        for i in range(nb):
            p = _im2col(x)  # (BHW, 9C)
            wmat = ws[i].reshape(9 * nc, nc)  # HWIO flatten matches col order
            x = jnp.maximum(p @ wmat, 0).reshape(b, h, w, nc)
        return x

    def im2col_pix_lanes(x, ws):
        for i in range(nb):
            p = _im2col(x).T  # (9C, BHW)
            wmat = ws[i].reshape(9 * nc, nc).T  # (C_out, 9C)
            x = jnp.maximum(wmat @ p, 0)  # (C_out, BHW) — lanes = pixels
            x = x.reshape(nc, b, h, w).transpose(1, 2, 3, 0)
        return x

    for name, fn in [("A direct NHWC", direct_nhwc),
                     ("B direct NCHW", direct_nchw),
                     ("C im2col pixels-in-rows", im2col_pix_rows),
                     ("D im2col pixels-in-lanes", im2col_pix_lanes)]:
        try:
            dt = timeit(jax.jit(fn), x, ws)
            print(f"{name}: {dt*1e3:.2f} ms, {flops/dt/1e12:.1f} TF/s "
                  f"({100*flops/dt/peak:.0f}% peak)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
