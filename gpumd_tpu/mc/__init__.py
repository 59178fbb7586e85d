from gpumd_tpu.mc.mcmd import MCMD  # noqa: F401
