"""Exact analytical FLOP counting from a traced jaxpr.

Round-4 shipped two MXU-utilization instruments that disagreed by ~50x:
the bench suite divided XLA ``cost_analysis()`` flops by peak
(``pct_mxu_bf16``), while the attribution probe hand-counted the conv
stack. Arbitration (round 5): the axon PJRT backend's ``cost_analysis``
reports ~0.97 GFLOP per pnp_tdnet image-iteration, but the conv stack's
analytical count — indisputable from the weight shapes — is ~49 GFLOP
(e.g. one nc=128 3x3 conv on a 128x128 pixel-unshuffled plane is
2*128^2*9*128*128 = 4.8 GFLOP alone). ``cost_analysis`` undercounts
convolutions ~50x on this backend; the probe was right.

This module replaces the broken instrument: it traces the jitted
function to a jaxpr and sums matmul-class FLOPs from the actual operand
shapes — backend-independent, deterministic, and exact for the ops that
can run on the MXU:

- ``conv_general_dilated``: 2 * prod(out_spatial) * batch * C_out *
  (C_in / groups) * prod(kernel_spatial)
- ``dot_general``: 2 * batch_dims * M * N * K

Elementwise/reduction ops are ignored (VPU work, negligible for the
conv-dominated pipelines; for the classical solvers the DFT matmuls ARE
dot_generals so they are counted too). Sub-jaxprs (scan/while/cond/pjit/
remat) are walked recursively; scan bodies multiply by trip count.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _conv_flops(eqn) -> float:
    """conv_general_dilated: 2 * out_elements * (Cin/groups) * kernel."""
    out = eqn.outvars[0].aval.shape
    dnums = eqn.params["dimension_numbers"]
    rhs_shape = eqn.invars[1].aval.shape
    groups = (eqn.params.get("feature_group_count", 1)
              * eqn.params.get("batch_group_count", 1))
    kernel_spatial = [rhs_shape[d] for d in dnums.rhs_spec[2:]]
    cin = rhs_shape[dnums.rhs_spec[1]]  # already per-group
    # out includes batch, C_out and spatial dims
    return 2.0 * float(np.prod(out)) * cin * float(np.prod(kernel_spatial))


def _dot_flops(eqn) -> float:
    """dot_general: 2 * batch * M * N * K."""
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    k = math.prod(lhs[d] for d in lhs_c)
    b = math.prod(lhs[d] for d in lhs_b)
    m = math.prod(s for d, s in enumerate(lhs)
                  if d not in lhs_c and d not in lhs_b)
    n = math.prod(s for d, s in enumerate(rhs)
                  if d not in rhs_c and d not in rhs_b)
    return 2.0 * b * m * n * k


def _fft_flops(eqn) -> float:
    """fft: 5 N log2(N) per transformed length (the standard radix-2
    count), x product of the batch dims. Covers fft/ifft/rfft/irfft."""
    shape = eqn.invars[0].aval.shape
    lengths = eqn.params.get("fft_lengths", ())
    if not lengths:
        return 0.0
    n = float(np.prod(lengths))
    batch = float(np.prod(shape)) / max(
        float(np.prod(shape[len(shape) - len(lengths):])), 1.0)
    return 5.0 * n * math.log2(max(n, 2.0)) * batch


def _count_jaxpr(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "fft":
            total += _fft_flops(eqn)
        elif name == "scan":
            body = eqn.params["jaxpr"].jaxpr
            total += eqn.params["length"] * _count_jaxpr(body)
        elif name == "while":
            # trip count unknown statically; count one body iteration
            total += _count_jaxpr(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(_count_jaxpr(b.jaxpr) for b in branches)
        else:
            # pjit / remat / custom_jvp / closed_call etc. carry sub-jaxprs
            for v in eqn.params.values():
                if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                    total += _count_jaxpr(v.jaxpr)  # ClosedJaxpr
                elif hasattr(v, "eqns"):  # bare Jaxpr
                    total += _count_jaxpr(v)
    return total


def matmul_flops(fn, *args, **kwargs) -> float:
    """Total conv+dot FLOPs of ``fn(*args)`` from its traced jaxpr."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _count_jaxpr(jaxpr.jaxpr)
