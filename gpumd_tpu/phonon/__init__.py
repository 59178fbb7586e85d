from gpumd_tpu.phonon.hessian import compute_phonon_dispersion  # noqa: F401
