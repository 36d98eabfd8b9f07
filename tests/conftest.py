"""Test harness config: CPU backend with 8 virtual devices and x64 enabled.

Mesh/collective logic is exercised on a virtual 8-device CPU mesh (no TPU
needed, per SURVEY.md §4 implication (3)); float64 is enabled so golden
parity tests can match the reference's NumPy-f64 solver loop exactly.
"""

import os
import sys

# NOTE: in this image jax is pre-imported by sitecustomize, so JAX_PLATFORMS
# in the environment is too late — switch platform via jax.config before the
# first backend use instead. XLA_FLAGS is still read lazily at backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is dominated by BM3D/solver jit
# compiles; caching them across runs cuts repeat wall-clock several-fold.
jax.config.update("jax_compilation_cache_dir", "/tmp/pnpadmm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "CS_MRI"))


requires_reference_data = pytest.mark.skipif(
    not reference_available(), reason="reference data assets not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
