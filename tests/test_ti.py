"""ti_spring nonequilibrium free-energy switching
(ref: src/integrate/ensemble_ti_spring.cu)."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _write_argon(tmp_path, nc=3):
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
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    return n


def test_ti_spring_explicit_k(tmp_path):
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ti_spring temp 20 tperiod 100 tswitch 400 tequil 100 spring Ar 0.5
run 1400
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    yaml = dict(
        line.split(": ")
        for line in (tmp_path / "ti_spring.yaml").read_text().splitlines()
    )
    f = float(yaml["F"])
    assert np.isfinite(f)
    # LJ argon at 20 K: F/atom = U_lattice (-0.086) + harmonic vibrational
    # free energy (~ +0.008); measured -0.0777 eV/atom
    assert -0.09 < f < -0.065, f
    csv = np.genfromtxt(tmp_path / "ti_spring.csv", delimiter=",",
                        skip_header=1)
    assert csv.shape[1] == 4
    # both switching legs recorded
    assert (csv[:, 0] >= 0).all() and csv[:, 0].max() > 0.99


def test_ti_spring_auto_k(tmp_path):
    """Auto spring constants from MSD give a similar free energy."""
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ti_spring temp 20 tperiod 100 tswitch 400 tequil 200
run 1600
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    yaml = dict(
        line.split(": ")
        for line in (tmp_path / "ti_spring.yaml").read_text().splitlines()
    )
    f = float(yaml["F"])
    assert np.isfinite(f)
    assert -0.09 < f < -0.065, f
