"""NEMD heat source/sink: a temperature gradient must develop."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


@pytest.mark.parametrize("ens", ["heat_lan", "heat_nhc", "heat_bdp"])
def test_heat_gradient(ens, tmp_path):
    a0 = 5.26
    nx, nyz = 8, 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nx) for j in range(nyz) for k in range(nyz)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    # 4 slabs along x as grouping method 0
    slab = np.minimum((pos[:, 0] / (nx * a0 / 4)).astype(int), 3)[:, None]
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nx * a0, nyz * a0, nyz * a0]),
        pbc=(True, True, True), groups=slab,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        f"""potential lj.txt
velocity 30
time_step 5
ensemble {ens} 30 50 15 0 2
compute 0 10 1000 temperature
run 1000
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.loadtxt(tmp_path / "compute.out")
    # one averaged row, 4 group temperatures; source (g0) hotter than sink (g2)
    temps = np.atleast_2d(data)[-1]
    assert temps.shape == (4,)
    assert temps[0] > temps[2] + 5.0, temps
