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
    # averaged rows: 4 group temperatures + 2 cumulative bath energies
    row = np.atleast_2d(data)[-1]
    assert row.shape == (6,)
    temps = row[:4]
    assert temps[0] > temps[2] + 5.0, temps
    # source bath injects energy (system->bath negative), sink absorbs
    e_src, e_snk = row[4], row[5]
    assert e_src < 0.0 and e_snk > 0.0, (e_src, e_snk)


def test_compute_full_columns(tmp_path):
    """virial/jp/jk/momentum group columns (ref: compute.cu:369-560)."""
    a0 = 5.26
    nx = 4
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nx) for j in range(2) for k in range(2)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    slab = np.minimum((pos[:, 0] / (nx * a0 / 2)).astype(int), 1)[:, None]
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nx * a0, 2 * a0, 2 * a0]),
        pbc=(True, True, True), groups=slab,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 30
time_step 5
compute 0 5 10 temperature potential force virial jp jk momentum
run 20
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.atleast_2d(np.loadtxt(tmp_path / "compute.out"))
    ng = 2
    # T, U, F(3), W(9), jp(3), jk(3), p(3) = 23 scalars x 2 groups + 2 baths
    assert data.shape[1] == 23 * ng + 2, data.shape
    assert np.isfinite(data).all()
    # potential sums must be negative (bound crystal)
    u = data[-1][ng : 2 * ng]
    assert (u < 0).all(), u


def test_heat_hybrid_gradient(tmp_path):
    """heat_hybrid with an NHC source and a Langevin sink builds a thermal
    gradient (ref: ensemble_heat_hybrid.cu)."""
    a0 = 5.26
    nx, nyz = 8, 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nx) for j in range(nyz) for k in range(nyz)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    slab = np.minimum((pos[:, 0] / (nx * a0 / 4)).astype(int), 3)[:, None]
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nx * a0, nyz * a0, nyz * a0]),
        pbc=(True, True, True), groups=slab,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 30
time_step 5
ensemble heat_hybrid nhc lan 30 100 100 15 0 2
compute 0 10 40 temperature
run 400
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.loadtxt(tmp_path / "compute.out")
    # columns: per-group T ... + 2 bath-energy columns
    t_src = data[-1, 0]
    t_snk = data[-1, 2]
    assert t_src > t_snk  # gradient from source group 0 to sink group 2
    assert np.isfinite(data).all()
