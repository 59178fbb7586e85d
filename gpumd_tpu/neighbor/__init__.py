from gpumd_tpu.neighbor.neighbor import (  # noqa: F401
    NeighborList,
    build_neighbor_list,
    neighbor_brute,
    neighbor_cell_list,
)
