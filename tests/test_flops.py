"""utils/flops.py — the exact jaxpr matmul-FLOP counter.

This instrument replaced the axon backend's ``cost_analysis()`` flops in
the bench suite after the round-5 arbitration showed cost_analysis counts
a ``lax.scan`` body ONCE regardless of trip count (undercount factor ==
scan length; scripts/profile_arbitration.py). These tests pin the
counter's exactness on every shape class the suite relies on."""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from pnp_admm_cnc_mri_tpu.utils import flops as fl


def test_matmul():
    a, b = jnp.zeros((128, 256)), jnp.zeros((256, 512))
    assert fl.matmul_flops(lambda x, y: x @ y, a, b) == 2 * 128 * 256 * 512


def test_batched_dot_general():
    a, b = jnp.zeros((4, 32, 64)), jnp.zeros((4, 64, 16))
    got = fl.matmul_flops(lambda x, y: jnp.einsum("bik,bkj->bij", x, y), a, b)
    assert got == 2 * 4 * 32 * 64 * 16


def test_conv():
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x, w = jnp.zeros((2, 64, 64, 32)), jnp.zeros((3, 3, 32, 48))
    assert fl.matmul_flops(conv, x, w) == 2 * 2 * 64 * 64 * 48 * 32 * 9


def test_grouped_conv_divides_cin():
    def gconv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=2)

    x, w = jnp.zeros((2, 64, 64, 32)), jnp.zeros((3, 3, 16, 48))
    assert fl.matmul_flops(gconv, x, w) == 2 * 2 * 64 * 64 * 48 * 16 * 9


def test_strided_conv_uses_out_spatial():
    def sconv(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x, w = jnp.zeros((1, 64, 64, 8)), jnp.zeros((3, 3, 8, 8))
    assert fl.matmul_flops(sconv, x, w) == 2 * 32 * 32 * 8 * 8 * 9


def test_scan_multiplies_by_trip_count():
    """The exact failure mode of cost_analysis on the axon backend."""
    def body(c, _):
        return c @ jnp.eye(128), None

    def scanned(c):
        out, _ = lax.scan(body, c, None, length=10)
        return out

    got = fl.matmul_flops(scanned, jnp.zeros((128, 128)))
    assert got == 10 * 2 * 128 ** 3


def test_nested_jit_and_remat_walked():
    inner = jax.jit(lambda x: x @ x)
    rem = jax.checkpoint(lambda x: inner(x) @ x)
    got = fl.matmul_flops(rem, jnp.zeros((64, 64)))
    assert got == 2 * 2 * 64 ** 3


def test_real_denoiser_magnitude():
    """dncnn17 at 256^2 is ~72.6 GFLOP/call analytically — the value the
    broken instrument reported as ~1.4 (50x low at iter 50)."""
    from pnp_admm_cnc_mri_tpu.priors import denoiser as dn

    den = dn.build_denoiser("dncnn_25", iter_num=30)
    x = jnp.zeros((1, 256, 256))
    gf = fl.matmul_flops(lambda u: den(u, 0), x) / 1e9
    assert 70.0 < gf < 76.0, gf


def test_fft_counts_5nlogn():
    import math

    x = jnp.zeros((4, 64, 64), jnp.complex64)
    got = fl.matmul_flops(lambda u: jnp.fft.fft2(u, axes=(-2, -1)).real.mean(), x)
    assert got == 4 * 5 * 64 * 64 * math.log2(64 * 64)
