"""FCC argon 4x4x4 supercell -> model.xyz."""
import numpy as np

from gpumd_tpu.io.xyz import XYZFrame, write_xyz

a0, nc = 5.26, 4
base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
cells = np.array([[i, j, k] for i in range(nc)
                  for j in range(nc) for k in range(nc)])
pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
write_xyz("model.xyz", XYZFrame(
    symbols=["Ar"] * len(pos), positions=pos,
    lattice=np.diag([nc * a0] * 3), pbc=(True, True, True)))
open("lj.txt", "w").write("lj 1 Ar\n1.032e-2 3.405 9.0\n")
print(f"wrote model.xyz ({len(pos)} atoms) + lj.txt")
