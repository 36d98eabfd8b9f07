from pnp_admm_cnc_mri_tpu.ops import fourier, metrics, prox, schedules  # noqa: F401
