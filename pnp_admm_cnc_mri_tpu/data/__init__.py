from pnp_admm_cnc_mri_tpu.data import images, masks, noise  # noqa: F401
