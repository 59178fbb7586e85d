from gpumd_tpu.minimize.minimizers import minimize_fire, minimize_sd  # noqa: F401
