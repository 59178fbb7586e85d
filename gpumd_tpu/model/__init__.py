from gpumd_tpu.model.box import Box  # noqa: F401
from gpumd_tpu.model.state import MDState, make_state  # noqa: F401
