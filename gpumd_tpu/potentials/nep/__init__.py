from gpumd_tpu.potentials.nep.params import NepModel, load_nep_txt  # noqa: F401
from gpumd_tpu.potentials.nep.model import NEP  # noqa: F401
