"""TPU-native Plug-and-Play ADMM framework for undersampled-MRI reconstruction.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
zj15001/PNP_ADMM_CNC_MRI (reference mounted at /root/reference):

- ADMM solvers with L1 / CNC (convex-nonconvex, GMC) proximal regularization
  and plug-and-play denoiser priors (BM3D, DnCNN, FDnCNN, IRCNN, FFDNet,
  DRUNet), reference entry scripts 【1】-【6】.
- Forward model: masked 2-D FFT ``y = F(x) * mask + n`` with 30%% Cartesian /
  Radial / Random sampling masks (reference ``【1】ADMM_L1.py:99``).
- Everything here is batched-first and jit-compiled: the whole ADMM fixed
  point iteration runs as one ``lax.scan`` on device, with scenario grids
  (images x masks x noise levels) sharded over a ``jax.sharding.Mesh``.

Unlike the reference (sequential float64 NumPy + per-iteration host<->device
round trips), the compute path never leaves the accelerator.
"""

__version__ = "0.1.0"

from pnp_admm_cnc_mri_tpu import config  # noqa: F401
from pnp_admm_cnc_mri_tpu.config import ADMMConfig  # noqa: F401


def __getattr__(name):
    """Lazy convenience exports (keep bare `import pnp_admm_cnc_mri_tpu`
    light; jax-heavy modules load on first use)."""
    import importlib

    lazy = {
        "solvers": "pnp_admm_cnc_mri_tpu.solvers",
        "ops": "pnp_admm_cnc_mri_tpu.ops",
        "data": "pnp_admm_cnc_mri_tpu.data",
        "parallel": "pnp_admm_cnc_mri_tpu.parallel",
        "native_rt": "pnp_admm_cnc_mri_tpu.native_rt",
    }
    if name in lazy:
        return importlib.import_module(lazy[name])
    raise AttributeError(name)
