from gpumd_tpu.train.dataset import StructureBatch, batch_structures  # noqa: F401
