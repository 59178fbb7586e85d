"""Groups, fix keyword, group-resolved compute."""

import numpy as np

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def make_grouped_argon(tmp_path, nc=2):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    # group by lower/upper half in z
    groups = (pos[:, 2] > nc * a0 / 2).astype(int)[:, None]
    frame = XYZFrame(
        symbols=["Ar"] * n,
        positions=pos,
        lattice=np.diag([nc * a0] * 3),
        pbc=(True, True, True),
        groups=groups,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    return n, groups[:, 0]


def test_fix_freezes_group(tmp_path):
    n, glabels = make_grouped_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 60
time_step 5
fix 0 0
ensemble nvt_lan 60 60 50
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    pos0 = np.asarray(s.frame.positions)
    posf = np.asarray(s.state.box.wrap(s.state.position))[:n]
    fixed = glabels == 0
    moved = np.linalg.norm(posf - pos0, axis=1)
    assert np.max(moved[fixed]) < 1e-9
    assert np.max(moved[~fixed]) > 1e-3
    # fixed atoms have zero velocity
    vel = np.asarray(s.state.velocity)[:n]
    assert np.max(np.abs(vel[fixed])) < 1e-12


def test_compute_group_averages(tmp_path):
    n, glabels = make_grouped_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 60
time_step 5
ensemble nve
compute 0 10 50 temperature potential
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.loadtxt(tmp_path / "compute.out")
    # 2 groups x (T, U) + 2 bath-energy columns appended with temperature
    # (ref: compute.cu:553-556), 2 output rows
    assert data.shape == (2, 6)
    assert np.all(data[:, :2] > 5.0)  # temperatures plausible
    assert np.all(data[:, 2:4] < 0.0)  # cohesive potential negative
