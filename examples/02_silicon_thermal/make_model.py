"""Diamond silicon 4x4x4 + SW potential -> HNEMD kappa."""
import numpy as np

from gpumd_tpu.io.xyz import XYZFrame, write_xyz

a0, nc = 5.431, 4
base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
                 [.25, .25, .25], [.75, .75, .25], [.75, .25, .75],
                 [.25, .75, .75]])
cells = np.array([[i, j, k] for i in range(nc)
                  for j in range(nc) for k in range(nc)])
pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
write_xyz("model.xyz", XYZFrame(
    symbols=["Si"] * len(pos), positions=pos,
    lattice=np.diag([nc * a0] * 3), pbc=(True, True, True)))
# Stillinger-Weber 1985 silicon (published parameters)
open("sw.txt", "w").write(
    "sw_1985 1 Si\n2.1683 21.0 7.049556277 0.6022245584 "
    "1.80 1.20 2.0951 -0.333333333333\n")
print(f"wrote model.xyz ({len(pos)} atoms) + sw.txt")
