from gpumd_tpu.io.xyz import read_xyz, write_xyz, XYZFrame  # noqa: F401
