from gpumd_tpu.integrate.ensembles.nve import NVE  # noqa: F401
