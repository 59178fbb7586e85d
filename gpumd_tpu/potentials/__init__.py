from gpumd_tpu.potentials.base import (  # noqa: F401
    PotentialOutput,
    compute_from_pair_energy,
    forces_virial_from_partials,
)
from gpumd_tpu.potentials.lj import LJ  # noqa: F401
