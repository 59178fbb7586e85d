from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2  # noqa: F401
from gpumd_tpu.integrate.thermo import compute_thermo, Thermo  # noqa: F401
