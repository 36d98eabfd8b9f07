"""Probe: where does the PnP-CNN conv path sit on the v5e roofline?

Measures achieved TFLOP/s for (a) direct 3x3 convs at nc=64 (DnCNN shape)
vs nc=128 (lane-ceiling test: the MXU is 128 wide, so co=64 can use at
most half the lanes), and (b) the batched-matmul core a Winograd F(2,3)
formulation would run (16 transform positions as the batch dim), which
predicts the ceiling for a Winograd rewrite (2.25x fewer multiplies).

Run on the TPU chip: python scripts/conv_roofline_probe.py
Axon rules: data synthesized on device, scalar fetch to time, args not
closures (CLAUDE.md).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=5, reps=3):
    out = fn(*args)  # compile + warm
    _ = float(jnp.sum(out).astype(jnp.float32))  # drain warmup
    best = float("inf")
    for _ in range(reps):  # take the best rep: the tunnel stalls randomly
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))  # scalar fetch barrier
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv_stack(x, ws, nb):
    for i in range(nb):
        x = jax.lax.conv_general_dilated(
            x, ws[i], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        x = jnp.maximum(x, 0)
    return x


def main():
    b, h, w, nb = 8, 256, 256, 16
    key = jax.random.PRNGKey(0)
    peak = 197e12  # v5e bf16

    for nc in (64, 128, 256):
        x = jax.random.normal(key, (b, h, w, nc), jnp.bfloat16)
        ws = jax.random.normal(key, (nb, 3, 3, nc, nc), jnp.bfloat16) * 0.01
        f = jax.jit(lambda x, ws: conv_stack(x, ws, nb))
        dt = timeit(f, x, ws)
        flops = 2 * b * h * w * 9 * nc * nc * nb
        print(f"direct conv nc={nc}: {dt*1e3:.2f} ms, "
              f"{flops/dt/1e12:.1f} TF/s ({100*flops/dt/peak:.0f}% peak)")

    # Winograd-core surrogate: batched matmul (16, M, ci) x (16, ci, co)
    nc = 64
    tiles = b * (h // 2) * (w // 2)
    v = jax.random.normal(key, (16, tiles, nc), jnp.bfloat16)
    u = jax.random.normal(key, (16, nc, nc), jnp.bfloat16) * 0.01

    def wino_core(v, u):
        return jnp.einsum("kmc,kcn->kmn", v, u,
                          preferred_element_type=jnp.bfloat16)

    f = jax.jit(wino_core)
    dt = timeit(f, v, u)
    flops = 2 * 16 * tiles * nc * nc
    # a Winograd F(2,3) layer replaces 2*b*h*w*9*nc*nc direct FLOPs with
    # these 2*16*tiles*nc*nc = 8/18 as many; report both raw and effective
    direct_flops = 2 * b * h * w * 9 * nc * nc
    print(f"wino-core bmm (16,{tiles},{nc})x(16,{nc},{nc}): {dt*1e3:.2f} ms, "
          f"{flops/dt/1e12:.1f} TF/s raw ({100*flops/dt/peak:.0f}% peak); "
          f"effective direct-conv rate {direct_flops/dt/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
