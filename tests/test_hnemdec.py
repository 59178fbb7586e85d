"""HNEMDEC (Evans-Cummings) driving + onsager.out
(ref: src/force/force.cu:355-961, src/measure/hnemdec_kappa.cu)."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _binary_crystal(tmp_path, nc=3):
    """Rocksalt-ish binary LJ crystal (two species, equal counts)."""
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    sym = (["Ar", "Kr"] * (n // 2 + 1))[:n]
    frame = XYZFrame(
        symbols=sym, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True, True, True),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text(
        "lj 2 Ar Kr\n"
        "1.032e-2 3.405 9.0\n1.2e-2 3.5 9.0\n1.2e-2 3.5 9.0\n1.4e-2 3.6 9.0\n"
    )
    return n


@pytest.mark.parametrize("mode", [0, 1])
def test_hnemdec_onsager(tmp_path, mode):
    _binary_crystal(tmp_path)
    (tmp_path / "run.in").write_text(
        f"""potential lj.txt
velocity 40
time_step 5
ensemble nvt_nhc 40 40 100
compute_hnemdec {mode} 20 0.0001 0 0
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.atleast_2d(np.loadtxt(tmp_path / "onsager.out"))
    # 3 heat + 3 * 2 diffusion columns, 10 output rows
    assert data.shape == (10, 9), data.shape
    assert np.isfinite(data).all()
    # driving along x: the x-flux column dominates its transverse partners
    jx = np.abs(data[:, 0]).mean()
    jy = np.abs(data[:, 1]).mean()
    assert jx > 0.0
    # heat mode: late-run x flux should respond to the driving force
    if mode == 0:
        assert jx > 0.1 * jy  # very loose structural gate


def test_hnemdec_coefficients_zero_net_force():
    """Color-flow coefficients give zero net driving force by construction
    (ref: force.cu:400-415)."""
    from gpumd_tpu.forcefield import hnemdec_coefficients

    masses = np.array([10.0] * 6 + [20.0] * 2)
    types = np.array([0] * 6 + [1] * 2)
    coef, mass_type, factor = hnemdec_coefficients(1, masses, types, 2)
    net = sum(coef[t] for t in types)
    assert abs(net) < 1e-10
    assert factor > 0.0
