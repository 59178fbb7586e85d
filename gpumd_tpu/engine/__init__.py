from gpumd_tpu.engine.grid import DenseGridPlan, bin_dense, plan_grid

__all__ = ["DenseGridPlan", "bin_dense", "plan_grid"]
