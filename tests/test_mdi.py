"""MDI engine mode (ref: src/main_mdi/run.cu:355-480)."""

import numpy as np
import pytest

from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _setup(tmp_path):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([2 * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        "potential lj.txt\nvelocity 20\ntime_step 5\nensemble nve\n"
    )
    return n, pos


def test_mdi_engine_roundtrip(tmp_path):
    from gpumd_tpu.app.mdi import BOHR, HARTREE, MDIEngine

    n, pos = _setup(tmp_path)
    eng = MDIEngine(str(tmp_path))
    assert eng.get_natoms() == n
    # coords round-trip in Bohr
    c = eng.get_coords()
    assert np.allclose(c * BOHR, pos, atol=1e-8)
    e0 = eng.get_energy()
    assert np.isfinite(e0) and e0 < 0.0  # cohesive, Hartree
    f = eng.get_forces()
    assert f.shape == (n, 3)
    assert np.allclose(f, 0.0, atol=1e-6)  # perfect lattice

    # displace one atom via >COORDS: forces appear, energy rises
    c2 = c.copy()
    c2[0, 0] += 0.4 / BOHR
    eng.set_coords(c2)
    e1 = eng.get_energy()
    assert e1 > e0
    f1 = eng.get_forces()
    assert abs(f1[0, 0]) > 1e-5
    # stress available
    s = eng.get_stress()
    assert s.shape == (3, 3) and np.isfinite(s).all()

    # step-one MD control
    eng.set_coords(c)
    eng.init_md()
    x_before = eng.get_coords()
    eng.step(5)
    x_after = eng.get_coords()
    assert not np.allclose(x_before, x_after)
