from pnp_admm_cnc_mri_tpu.utils import logger  # noqa: F401
