"""Steinhardt q_l / w_l_hat against exact fcc values
(ref: src/measure/orientorder.cu)."""

import numpy as np

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def test_orientorder_fcc(tmp_path):
    a0 = 5.26
    nc = 3
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True, True, True),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    # first-shell cutoff between 1st (3.72) and 2nd (5.26) fcc shells
    (tmp_path / "run.in").write_text(
        """potential lj.txt
time_step 5
compute_orientorder 5 cutoff 4.4 2 4 6 0 1 1
run 5
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    lines = (tmp_path / "orientorder.out").read_text().splitlines()
    assert lines[0].startswith("step =")
    assert lines[1].split() == ["ql4", "ql6", "wl4", "wl6",
                                "wlhat4", "wlhat6"]
    data = np.loadtxt(lines[2:])
    assert data.shape == (n, 6)
    # exact perfect-fcc values (12 nearest neighbors):
    # q4 = 0.190941, q6 = 0.574524, w4_hat = -0.159317, w6_hat = -0.013161
    np.testing.assert_allclose(data[:, 0], 0.190941, atol=2e-5)
    np.testing.assert_allclose(data[:, 1], 0.574524, atol=2e-5)
    np.testing.assert_allclose(data[:, 4], -0.159317, atol=2e-4)
    np.testing.assert_allclose(data[:, 5], -0.013161, atol=2e-4)


def test_orientorder_nnn_mode(tmp_path):
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
        lattice=np.diag([nc * a0] * 3), pbc=(True, True, True),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
time_step 5
compute_orientorder 5 nnn 12 1 6
run 5
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    lines = (tmp_path / "orientorder.out").read_text().splitlines()
    data = np.loadtxt(lines[2:])
    np.testing.assert_allclose(data, 0.574524, atol=2e-5)
