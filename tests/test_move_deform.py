"""move (constant-velocity group) and deform (box strain) keywords."""

import numpy as np

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def make_slab(tmp_path):
    a0 = 5.26
    nx = 4
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nx) for j in range(2) for k in range(2)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    # group 0 = left wall, group 1 = right wall, group 2 = middle
    g = np.full(n, 2)
    g[pos[:, 0] < a0] = 0
    g[pos[:, 0] > (nx - 1) * a0] = 1
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nx * a0, 2 * a0, 2 * a0]),
        pbc=(False, True, True), groups=g[:, None],
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    return n, g, pos


def test_move_group_constant_velocity(tmp_path):
    n, g, pos0 = make_slab(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 10
time_step 5
fix 0 0
move 0 1 0.01 0 0
ensemble nve
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    posf = np.asarray(s.state.position)[:n]
    moved = posf[:, 0] - pos0[:, 0]
    # moving wall advanced by ~ v * t = 0.01 A/fs * 500 fs = 5 A
    assert np.allclose(moved[g == 1], 5.0, atol=0.1), moved[g == 1][:3]
    # fixed wall did not move
    assert np.max(np.abs(moved[g == 0])) < 1e-9


def test_deform_stretches_box(tmp_path):
    n, g, pos0 = make_slab(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 2
deform 0.001 0 1 0
ensemble nvt_lan 20 20 100
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    h = np.asarray(s.state.box.h)
    # y grew by 100 * 0.001 = 0.1 A; x and z unchanged
    assert np.isclose(h[1, 1], 2 * 5.26 + 0.1, atol=1e-6)
    assert np.isclose(h[0, 0], 4 * 5.26, atol=1e-9)
