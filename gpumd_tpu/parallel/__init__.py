from gpumd_tpu.parallel.domain import ShardedMD, make_mesh  # noqa: F401
