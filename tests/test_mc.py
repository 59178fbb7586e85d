"""Hybrid MCMD: canonical swaps preserve composition; SGC shifts it."""

import numpy as np

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def make_binary_lj(tmp_path, nc=2):
    a0 = 5.0
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    symbols = ["Ar" if i < n // 2 else "Kr" for i in range(n)]
    frame = XYZFrame(
        symbols=symbols, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text(
        "lj 2 Ar Kr\n"
        "1.032e-2 3.405 8.0\n"
        "1.2e-2 3.5 8.0\n"
        "1.2e-2 3.5 8.0\n"
        "1.4e-2 3.65 8.0\n"
    )
    return n


def test_canonical_mcmd_preserves_composition(tmp_path):
    n = make_binary_lj(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 50
time_step 5
ensemble nvt_lan 50 50 100
mc canonical 20 5 50 50
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    out = np.loadtxt(tmp_path / "mcmd.out")
    assert out.shape == (5, 2)
    types = np.asarray(s.state.type)[:n]
    assert (types == 0).sum() == n // 2  # composition conserved


def test_sgc_mcmd_changes_composition(tmp_path):
    n = make_binary_lj(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 50
time_step 5
ensemble nvt_lan 50 50 100
mc sgc 20 10 50 50 2 Ar 0.0 Kr 2.0
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    types = np.asarray(s.state.type)[:n]
    # large positive mu for Kr favors converting atoms to Kr
    assert (types == 1).sum() > n // 2
