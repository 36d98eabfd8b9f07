"""Structured configuration for solvers and experiments.

The reference scatters configuration across per-script argparse wrappers and
module-level local variables (reference ``【1】ADMM_L1.py:21-48``); here every
experiment is a frozen dataclass so configs are hashable (usable as jit
static args) and serializable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    """Hyper-parameters shared by every ADMM variant.

    Naming follows the reference: ``rho`` is the Lagrange parameter the
    reference calls ``reo`` (= 1/beta of the CNC paper, reference
    ``【4】ADMM_CNC .py:40``), ``lam`` the regularization weight ``lambda1``.
    """

    iter_num: int = 50
    rho: float = 0.015
    lam: float = 0.1
    # CNC-only parameters (reference ``【4】ADMM_CNC .py:126-129``):
    alpha: float = 0.45
    b: float = 64.0  # b^2 of the paper
    # Tolerance-based stopping (new capability; reference always runs a
    # fixed count). ``tol=None`` reproduces the reference behavior.
    tol: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    """Configuration of a learned denoiser prior (reference 【3】/【6】)."""

    model_name: str = "dncnn_25"
    noise_level_model: float = 15.0  # on the [0,255] scale
    x8: bool = False  # dihedral self-ensemble
    # sigma-schedule (DRUNet / IRCNN), reference ``utils/utils_pnp.py:14-23``
    model_sigma1: float = 49.0
    model_sigma2: Optional[float] = None  # default: noise_level_model


# Reference per-model defaults for PnP-ADMM-L1-D (reference
# ``【3】PNP_ADMM_L1_D  .py:339-348``): (iter_num, rho)
PNP_L1_DEFAULTS = {
    "fdncnn_gray": (50, 0.25),
    "dncnn_15": (50, 0.15),
    "dncnn_25": (50, 0.15),
    "dncnn_50": (50, 0.15),
    "ffdnet_gray": (50, 0.25),
    "ircnn_gray": (50, 0.145),
    "drunet_gray": (50, 0.26),
}

# Reference per-model defaults for PnP-ADMM-CNC-D (reference
# ``【6】PNP_ADMM_CNC_D .py:569-578``): (alpha, iter_num, lam, rho, b)
PNP_CNC_DEFAULTS = {
    "fdncnn_gray": (0.9, 50, 0.2, 0.45, 0.3),
    "dncnn_pair": (1.2, 50, 4.0, 0.45, 0.3),
    "ffdnet_gray": (0.9, 50, 1.35, 0.45, 0.3),
    "ircnn_gray": (0.5, 50, 1.3, 0.45, 2.0),
    "drunet_gray": (1.0, 50, 0.8, 0.8, 0.45),
}

# Classical defaults (reference ``【1】ADMM_L1.py:171``, ``【4】ADMM_CNC .py:176``,
# ``【2】PNP_ADMM_L1_BM3D .py:174``, ``【5】PNP_ADMM_CNC_BM3D .py:183``).
ADMM_L1_DEFAULT = ADMMConfig(iter_num=50, lam=0.1, rho=0.015)
ADMM_CNC_DEFAULT = ADMMConfig(iter_num=50, lam=0.5, rho=0.05, alpha=0.45, b=64.0)
PNP_L1_BM3D_DEFAULT = ADMMConfig(iter_num=50, rho=0.8)
PNP_CNC_BM3D_DEFAULT = ADMMConfig(iter_num=50, lam=0.02, rho=0.6, alpha=1.2, b=36.0)

# Tuned settings (new capability; docs/USAGE.md): short-iteration schedules
# + per-model noise-level endpoints found by sweep against the self-trained
# zoo weights on set1/Q_Random30, validated on the full 15-image set. The
# reference's own numbers are likewise sweep last-runs
# (``results/Set1_dn_*_gray/*.log``). Keys: ADMMConfig overrides plus the
# denoiser knobs ``nlm`` ([0,255] scale) and ``x8``. Applied by the CLI's
# ``--tuned`` flag; explicit flags still win.
TUNED_PNP_L1 = {
    "dncnn_15": dict(iter_num=4, rho=1.0),
    "dncnn_25": dict(iter_num=4, rho=1.2),
    "dncnn_50": dict(iter_num=4, rho=3.0),
    "fdncnn_gray": dict(iter_num=4, rho=0.8, nlm=12.0),
    "ffdnet_gray": dict(iter_num=4, rho=0.8, nlm=12.0),
    "ircnn_gray": dict(iter_num=15, rho=0.65, nlm=8.0),
    "drunet_gray": dict(iter_num=4, rho=0.45, nlm=5.0, x8=False),
}
TUNED_PNP_CNC = {
    "fdncnn_gray": dict(iter_num=4, alpha=1.6, nlm=12.0),
    "ffdnet_gray": dict(iter_num=4, alpha=1.8),
    "ircnn_gray": dict(iter_num=6, alpha=1.0, nlm=8.0),
    "drunet_gray": dict(iter_num=4, alpha=1.8),
    "dncnn_pair": dict(iter_num=5, alpha=0.7),
}
TUNED_BM3D = {
    "pnp_l1_bm3d": dict(iter_num=3, rho=1.0, nlm=15.0),
    "pnp_cnc_bm3d": dict(iter_num=4, alpha=1.6, nlm=25.0),
}

# consensus_d (multi-mask joint reconstruction with a denoiser z-prox):
# swept on set1 across all three reference masks jointly; the consensus
# data term is 3x stronger than single-mask, so the fixed point prefers a
# much larger rho than the single-mask PnP defaults.
TUNED_CONSENSUS_D = {
    "drunet_gray": dict(iter_num=4, rho=1.2),      # set1 33.24 / set 32.65
    "ffdnet_gray": dict(iter_num=4, rho=1.8, nlm=12.0),  # set1 31.33
    "fdncnn_gray": dict(iter_num=4, rho=2.4, nlm=12.0),  # set1 31.25
    "ircnn_gray": dict(iter_num=4, rho=1.2),       # set1 30.55
    "dncnn_25": dict(iter_num=4, rho=3.0),         # set1 30.65
}

# PnP-FISTA (solvers/fista.py — accelerated proximal gradient with a
# denoiser prox, step=1 canonical since the data-term Lipschitz constant
# is exactly 1): swept on set1/Q_Random30 with the CLEAN weights. FISTA
# extrapolation reaches better fixed points than PnP-ADMM here — drunet
# 31.50 vs 31.02, ffdnet 31.22 vs 30.76 — the framework's best
# single-mask clean numbers.
TUNED_FISTA_D = {
    "drunet_gray": dict(iter_num=30, nlm=12.0, model_sigma1=15.0, x8=True),  # 31.55
    # set1 / 32.77 full set with the round-3 self-distilled clean weights
    # (stream-distilled from the r2 incumbent, scripts/train_round16_r3.sh;
    # the r2 incumbent scored 31.50/32.66 and is archived as
    # model_zoo/drunet_gray_clean_r2.npz)
    "tdnet": dict(iter_num=30, nlm=10.0, model_sigma1=15.0, x8=True),  # 31.26
    # (31.18 no-x8) set1 / 32.45 full set — the MXU-shaped nc=128 student
    # (models/tdnet.py) distilled from the clean drunet teacher on the
    # infinite synth stream (results/tdnet_sweep.jsonl); beats every clean
    # CNN prior except its teacher, at a fraction of the conv cost
    "ffdnet_gray": dict(iter_num=30, nlm=11.0),   # 31.22
    "fdncnn_gray": dict(iter_num=30, nlm=10.0),   # 31.15
    "ircnn_gray": dict(iter_num=30, nlm=12.0),    # 31.00
    "dncnn_25": dict(iter_num=30),                # 29.14
    "bm3d": dict(iter_num=10, nlm=15.0),          # 31.22 (weight-free;
    # +0.67 over the tuned ADMM BM3D pipelines, converged by 10 iters)
}

# PnP-HQS (solvers/hqs.py — the DPIR iteration on the MRI problem; the
# ladder the reference vendors in utils/utils_pnp.py:14 drives BOTH the
# per-iteration data-solve weight and the denoiser sigma). Keys: iter_num,
# nlm (= model_sigma2, the ladder endpoint), sigma255 (the alpha-ladder
# scale — DPIR's degradation-noise sigma knob), model_sigma1. Swept on
# set1/Q_Random30 with the CLEAN weights.
TUNED_HQS_D = {
    "drunet_gray": dict(iter_num=30, nlm=8.0, sigma255=10.0, x8=True),  # 31.48 (31.32 no-x8)
    "tdnet": dict(iter_num=30, nlm=8.0, sigma255=10.0, x8=True),  # 31.10
    # (distilled MXU student; results/tdnet_sweep.jsonl)
    "ffdnet_gray": dict(iter_num=30, nlm=10.0, sigma255=5.0),   # 31.14
    "fdncnn_gray": dict(iter_num=30, nlm=10.0, sigma255=5.0),   # 31.05
    "ircnn_gray": dict(iter_num=30, nlm=8.0, sigma255=5.0),     # 31.20
    "dncnn_25": dict(iter_num=10, sigma255=1.0),                # 29.12
    "bm3d": dict(iter_num=10, nlm=10.0, sigma255=10.0),         # 31.26 (weight-
    # free — above the tuned ADMM BM3D pipelines and the FISTA bm3d 31.22)
}

# RED (solvers/red.py — explicit denoiser-built regularizer, fixed-point
# variant; Romano-Elad-Milanfar 2017). Keys: iter_num, lam (regularizer
# weight), nlm (FIXED denoiser sigma — RED uses a constant-strength
# denoiser, so the CLI flattens the ladder with model_sigma1 = nlm).
# Swept on set1/Q_Random30 with the CLEAN weights.
TUNED_RED_D = {
    "drunet_gray": dict(iter_num=50, lam=0.3, nlm=8.0),
    "tdnet": dict(iter_num=50, lam=0.3, nlm=20.0),  # 28.36 set1 — the
    # distilled student's residual scale suits RED's constant-sigma
    # iteration far less than the ladder solvers (FISTA 31.26, HQS 31.10);
    # kept for API symmetry (results/tdnet_sweep.jsonl)
    "ffdnet_gray": dict(iter_num=50, lam=0.3, nlm=10.0),
    "fdncnn_gray": dict(iter_num=50, lam=0.3, nlm=10.0),
    "ircnn_gray": dict(iter_num=50, lam=0.3, nlm=10.0),
    "dncnn_25": dict(iter_num=50, lam=0.3),
    "bm3d": dict(iter_num=20, lam=0.3, nlm=15.0),
}

# Multi-mask consensus FISTA (parallel/consensus.run_consensus_fista —
# union-preconditioned fused gradient, one psum/iter): swept on set1
# across all three reference masks jointly, CLEAN weights. Beats
# consensus-ADMM clean by 1-1.9 dB per family.
TUNED_CONSENSUS_FISTA = {
    "drunet_gray": dict(iter_num=30, nlm=12.0, model_sigma1=15.0, x8=True),  # 32.32
    # set1 / 33.44 full set with the round-3 self-distilled clean weights
    # (r2 incumbent: 32.28/33.31)
    "tdnet": dict(iter_num=30, nlm=12.0, model_sigma1=15.0, x8=True),  # 32.20/33.32
    # set1 (distilled MXU student — above ircnn/fdncnn/ffdnet, behind its
    # teacher only; results/tdnet_sweep.jsonl)
    "ircnn_gray": dict(iter_num=30, nlm=12.0),    # 32.15
    "fdncnn_gray": dict(iter_num=30, nlm=12.0),   # 32.11
    "ffdnet_gray": dict(iter_num=30, nlm=13.0),   # 32.12 (the union's
    # better conditioning prefers a stronger prior than single-mask's 11)
    "dncnn_25": dict(iter_num=30),                # 30.07
    "bm3d": dict(iter_num=10, nlm=15.0),          # 32.14 (weight-free)
}

# Multi-mask consensus HQS (parallel/consensus.run_consensus_hqs — EXACT
# joint k-space data solve, per-obs reductions hoisted out of the loop):
# swept on set1 across all three reference masks jointly, CLEAN weights.
# Keys as TUNED_HQS_D (nlm = ladder endpoint, sigma255 = alpha-ladder
# scale).
TUNED_CONSENSUS_HQS = {
    "drunet_gray": dict(iter_num=30, nlm=8.0, sigma255=10.0, x8=True),
    "ffdnet_gray": dict(iter_num=30, nlm=10.0, sigma255=5.0),
    "fdncnn_gray": dict(iter_num=30, nlm=10.0, sigma255=5.0),
    "ircnn_gray": dict(iter_num=30, nlm=8.0, sigma255=5.0),
    "dncnn_25": dict(iter_num=10, sigma255=1.0),
    "bm3d": dict(iter_num=10, nlm=10.0, sigma255=10.0),
}

# PGD / ISTA (momentum-off forward-backward splitting) — the algorithm
# family the reference demonstrably ran but whose entry scripts were
# deleted before publication: its results tree records full metric logs
# (``results/Set_dn_PGD_L1/Set_dn_PGD_L1.log`` best Set average 23.45;
# ``Set1_dnPGD soft/…log`` sweeps the step "alpha" over 0.4-1.0;
# ``Set1_dn_PNP_PGD_L1_BM3D/…log`` 26.01 dB on 11.png) plus
# PNP_PGD_CNC_* output PNGs. Swept on this framework (see PARITY.md PGD
# rows); without FISTA extrapolation the same prox families prefer more
# iterations.
TUNED_PGD_L1 = dict(iter_num=100, lam=4e-4, step=1.0)  # Set avg 23.725
# (reference best observed 23.452, last 22.929; on their single-image
# "Set1" = 11.png our plateau is 24.40 @ lam 8e-4/step 0.6 vs their
# sweep-best 24.57 and final runs 22.9-24.3)
TUNED_PGD_D = {
    "drunet_gray": dict(iter_num=30, nlm=12.0, model_sigma1=15.0, x8=True),
    # 31.55 set1 clean — momentum-off matches PnP-FISTA here (the ladder
    # prior, not the extrapolation, sets the fixed point)
    "tdnet": dict(iter_num=40, nlm=10.0, model_sigma1=15.0, x8=True),  # 31.27
    "ffdnet_gray": dict(iter_num=40, nlm=11.0),   # 31.22
    "fdncnn_gray": dict(iter_num=40, nlm=10.0),   # 31.15
    "ircnn_gray": dict(iter_num=40, nlm=12.0),    # 30.96
    "dncnn_25": dict(iter_num=40),                # 29.14
    "bm3d": dict(iter_num=15, nlm=15.0),  # 33.25 on 11.png / 32.65 Set avg
    # vs the reference's PNP_PGD_L1_BM3D logs: 26.01 (11.png), 24.69 best
    # Set average
}
# PGD-CNC (double-denoiser GMC prox in PGD form; solvers/fista.pnp_pgd_cnc)
TUNED_PGD_CNC = {
    "bm3d": dict(iter_num=10, alpha=1.0, lam=0.02, b=36.0, nlm=25.0),
    # 33.24 on the reference's PGD testbed image 11.png (its only PGD-CNC
    # evidence is the output PNG 11_PNP_PGD_CNC_BM3D.png)
    # CNN priors prefer a nearly-pure prox composition (alpha -> 1, small
    # GMC correction): swept on drunet (26.9 at the BM3D-shaped
    # alpha=1.2/lam=0.02; 31.48 below) and applied shape-wise to the rest
    "drunet_gray": dict(iter_num=30, alpha=1.0, lam=0.001, b=36.0,
                        nlm=12.0, model_sigma1=15.0),  # 31.48 set1 clean
    "tdnet": dict(iter_num=30, alpha=1.0, lam=0.001, b=36.0, nlm=10.0,
                  model_sigma1=15.0),
    "ffdnet_gray": dict(iter_num=30, alpha=1.0, lam=0.001, b=36.0, nlm=11.0),
    "fdncnn_gray": dict(iter_num=30, alpha=1.0, lam=0.001, b=36.0, nlm=10.0),
    "ircnn_gray": dict(iter_num=30, alpha=1.0, lam=0.001, b=36.0, nlm=12.0),
    "dncnn_25": dict(iter_num=30, alpha=1.0, lam=0.001, b=36.0),
}

# Leakage-free (clean-corpus) tuned settings: swept for the
# model_zoo/<name>_clean.npz weights (train/corpus.py; round-2). Selected
# by the CLI's --clean --tuned combination; entries absent here fall back
# to the TUNED_* tables above. Comments: set1/Q_Random30 PSNR from the
# sweep (docs/USAGE.md carries the validated full-set numbers).
TUNED_PNP_L1_CLEAN: dict = {
    "dncnn_15": dict(iter_num=4, rho=1.0),                # 30.37
    "dncnn_25": dict(iter_num=4, rho=1.5),                # 29.68
    "dncnn_50": dict(iter_num=4, rho=4.0),                # 28.39 (11.png 29.64 @ rho 6)
    "fdncnn_gray": dict(iter_num=8, rho=0.5, nlm=8.0),    # 30.79
    "ffdnet_gray": dict(iter_num=10, rho=0.5, nlm=8.0),   # 30.76
    "ircnn_gray": dict(iter_num=24, rho=0.45, nlm=5.0),   # 30.86
    "drunet_gray": dict(iter_num=50, rho=0.5, nlm=8.0, x8=False),  # 30.93 (31.02 with x8)
}
TUNED_PNP_CNC_CLEAN: dict = {
    "drunet_gray": dict(iter_num=4, alpha=1.4, nlm=8.0),  # 30.54
    "ffdnet_gray": dict(iter_num=8, alpha=1.4, nlm=12.0),  # 30.75
    "fdncnn_gray": dict(iter_num=8, alpha=1.0, nlm=8.0),  # 30.82
    "ircnn_gray": dict(iter_num=10, alpha=0.7, nlm=5.0),  # 30.38
    "dncnn_pair": dict(iter_num=6, alpha=0.5),            # 29.90
}
TUNED_CONSENSUS_D_CLEAN: dict = {
    "ffdnet_gray": dict(iter_num=4, rho=1.8, nlm=12.0),   # 31.01
    "fdncnn_gray": dict(iter_num=4, rho=1.8, nlm=12.0),   # 31.00
    "ircnn_gray": dict(iter_num=4, rho=0.8, nlm=8.0),     # 30.39
    "dncnn_25": dict(iter_num=4, rho=3.0),                # 30.18
    "drunet_gray": dict(iter_num=4, rho=0.8, nlm=8.0),    # 30.22
}

# DPIR-style restoration pipelines (pnp_sr / pnp_deblur): per-model tuned
# (iter_num, nlm[, model_sigma1]) swept on set1 (round-2, item 8 of the
# round-1 verdict). The conditioned models (ffdnet/fdncnn) need a LOW
# sigma-ladder start on deblurring: the default model_sigma1=49 start
# over-smooths past what the weak deblur data term can recover
# (measured 19-20 dB at 49 vs ~32 dB at 10).
TUNED_SR: dict = {
    "drunet_gray": dict(iter_num=8, nlm=2.0),             # 35.07
    "ffdnet_gray": dict(iter_num=8, nlm=8.0),             # 32.08
    "fdncnn_gray": dict(iter_num=12, nlm=8.0),            # 32.29
    "ircnn_gray": dict(iter_num=12, nlm=2.0),             # 32.38
    "dncnn_25": dict(iter_num=8, nlm=8.0),                # 29.91
}
TUNED_DEBLUR: dict = {
    "drunet_gray": dict(iter_num=8, nlm=2.0),             # 35.13
    "ffdnet_gray": dict(iter_num=8, nlm=8.0, model_sigma1=10.0),  # 32.28
    "fdncnn_gray": dict(iter_num=12, nlm=8.0, model_sigma1=10.0),  # 32.37
    "ircnn_gray": dict(iter_num=12, nlm=2.0),             # 32.51
    "dncnn_25": dict(iter_num=8, nlm=8.0),                # 29.97
}
TUNED_SR_CLEAN: dict = {
    "drunet_gray": dict(iter_num=12, nlm=4.0),            # 32.44
    "ffdnet_gray": dict(iter_num=8, nlm=8.0),             # 31.91
    "fdncnn_gray": dict(iter_num=8, nlm=8.0),             # 31.96
    "ircnn_gray": dict(iter_num=12, nlm=2.0),             # 32.24
    "dncnn_25": dict(iter_num=8, nlm=8.0),                # 29.24
}
TUNED_DEBLUR_CLEAN: dict = {
    "drunet_gray": dict(iter_num=12, nlm=4.0),            # 32.54
    "ffdnet_gray": dict(iter_num=8, nlm=8.0, model_sigma1=10.0),  # 31.99
    "fdncnn_gray": dict(iter_num=8, nlm=8.0, model_sigma1=10.0),  # 32.04
    "ircnn_gray": dict(iter_num=12, nlm=2.0),             # 32.35
    "dncnn_25": dict(iter_num=8, nlm=8.0),                # 29.30
}

MASK_NAMES: Tuple[str, ...] = ("Q_Random30", "Q_Radial30", "Q_Cartesian30")

# Blur kernels for the deblurring pipeline — single source of truth shared
# by the CLI parser and cli.experiments.make_blur_kernel.
DEBLUR_KERNELS: Tuple[str, ...] = ("aniso", "gauss", "box")
MODEL_NAMES: Tuple[str, ...] = (
    "fdncnn_gray",
    "drunet_gray",
    "ircnn_gray",
    "ffdnet_gray",
    "dncnn_15",
    "dncnn_25",
    "dncnn_50",
)
