"""External force drivers: add_force / add_random_force / electron_stop /
add_efield (ref: src/main_gpumd/add_*.cu, electron_stop.cu)."""

import numpy as np

from conftest import requires_reference
from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _argon(tmp_path, nc=2, groups=None, charges=None):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True, True, True),
        groups=groups,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame,
              with_groups=groups is not None)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    return n, pos


def test_add_force_accelerates_group(tmp_path):
    n, pos = _argon(tmp_path, groups=np.zeros((32, 1), int))
    (tmp_path / "run.in").write_text(
        """potential lj.txt
time_step 5
add_force 0 0 0.02 0 0
dump_restart 40
run 40
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    v = np.asarray(s.state.velocity)
    # constant +x force on everything: net +x momentum develops
    assert v[:, 0].mean() > 0.0
    assert abs(v[:, 1].mean()) < 1e-6


def test_add_random_force_keeps_momentum(tmp_path):
    n, pos = _argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 10
time_step 5
add_random_force 0.01
run 50
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    v = np.asarray(s.state.velocity)
    m = np.asarray(s.state.mass)
    ptot = (m[:, None] * v).sum(axis=0)
    assert np.all(np.abs(ptot) < 1e-6), ptot
    assert np.abs(v).max() > 0.0


def test_electron_stop_damps_fast_atoms(tmp_path):
    n, pos = _argon(tmp_path)
    # stopping table: constant power 0.2 eV/A between 1 and 100 eV
    (tmp_path / "stop.txt").write_text(
        "3 1.0 100.0\n0.2\n0.2\n0.2\n"
    )
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 3000
time_step 1
electron_stop stop.txt
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    from gpumd_tpu.units import K_B

    t_final = float(s.state.temperature())
    assert t_final < 2500.0, t_final  # radiation energy drained


def test_add_efield_needs_charge(tmp_path):
    n, pos = _argon(tmp_path, groups=np.zeros((32, 1), int))
    (tmp_path / "run.in").write_text(
        """potential lj.txt
time_step 5
add_efield 0 0 0.1 0 0 charge
run 10
"""
    )
    s = Session(str(tmp_path), quiet=True)
    import pytest

    with pytest.raises(ValueError, match="charge"):
        s.execute()


def test_add_spring_pulls_group(tmp_path):
    """SMD ghost-COM spring pulls the group along the anchor path
    (ref: add_spring.cu MODE_GHOST_COM couple)."""
    n, _ = _argon(tmp_path, groups=np.zeros((32, 1), int))
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 10
time_step 5
ensemble nve
add_spring ghost_com 0 0 0.02 0 0 couple 1.0 0.0 0 0 0
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    g = np.asarray(s.groups.mask(0, 0)) > 0
    x0 = np.asarray(s.frame.positions)[:, 0]
    x1 = np.asarray(s.state.unwrapped_position)[: len(x0), 0]
    # anchor moved 0.02*200 = 4 A; group pulled along +x
    dx_group = (x1[g] - x0[g]).mean()
    assert dx_group > 1.0, dx_group


def test_change_box(tmp_path):
    """change_box deforms the cell and positions affinely
    (ref: run.cu:712-810)."""
    n, _ = _argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
change_box 2.0 0.0 0.0
time_step 5
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    h = np.asarray(s.state.box.h)
    lx0 = np.asarray(s.frame.lattice)[0, 0]
    assert np.isclose(h[0, 0], lx0 + 2.0)
    # positions scaled by the same factor
    scale = (lx0 + 2.0) / lx0
    x0 = np.asarray(s.frame.positions)[:, 0]
    x1 = np.asarray(s.state.position)[: len(x0), 0]
    assert np.allclose(x1, x0 * scale, atol=1e-6)


def test_deposit_grows_system(tmp_path):
    """Vapor deposition: masked pre-padded atoms activate at intervals and
    fall onto the substrate (ref: deposition.cu)."""
    a0 = 5.26
    nc = 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0, nc * a0, 40.0]), pbc=(True, True, False),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble nve
deposit 40 2 30.0 35.0 atom 0 2 -0.05
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    mask = np.asarray(s.state.mask)
    # 200/40 = 5 events x 2 atoms activated
    assert int(mask.sum()) == n + 10
    # deposited atoms moved downward from the spawn slab
    z = np.asarray(s.state.position)[n:, 2]
    act = mask[n:] > 0
    assert act.sum() == 10
    assert np.isfinite(z[act]).all()
    # earlier deposits have fallen below the spawn slab floor
    assert (z[act] < 30.0).any()


@requires_reference
def test_add_efield_bec_mode(tmp_path):
    """add_efield ... bec: forces come from Z* . E with the qNEP Born
    tensors (ref: add_efield.cu bec branch)."""
    import shutil

    src = ("/root/reference/tests_pytest/fixtures/models/"
           "qnep_mode1_BaTiO3.txt")
    struct = ("/root/reference/tests_pytest/fixtures/structures/"
              "BaTiO3-nat40-rattled.xyz")
    import os

    if not (os.path.exists(src) and os.path.exists(struct)):
        import pytest

        pytest.skip("qNEP fixtures absent")
    shutil.copy(src, tmp_path / "nep.txt")
    from gpumd_tpu.io.xyz import read_xyz, write_xyz

    fr = read_xyz(struct)
    n = fr.n_atoms
    fr.groups = np.zeros((n, 1), int)
    write_xyz(str(tmp_path / "model.xyz"), fr, with_groups=True)
    (tmp_path / "run.in").write_text(
        """potential nep.txt
velocity 10
time_step 0.5
add_efield 0 0 0.05 0 0 bec
run 4
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    assert np.isfinite(np.asarray(s.state.force)).all()
    # the field does net work along x: momentum along x is nonzero
    v = np.asarray(s.state.velocity)[:n]
    m = np.asarray(s.state.mass)[:n]
    px = float((m * v[:, 0]).sum())
    assert np.isfinite(px)
