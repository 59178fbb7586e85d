"""compute_cohesive / compute_elastic on Tersoff silicon."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz

from conftest import requires_reference

A0 = 5.432


def make_si_dir(tmp_path, nc=2):
    import shutil

    base = np.array(
        [
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.25, 0.25, 0.25], [0.75, 0.75, 0.25],
            [0.75, 0.25, 0.75], [0.25, 0.75, 0.75],
        ]
    )
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * A0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Si"] * n, positions=pos,
        lattice=np.diag([nc * A0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    shutil.copy(
        "/root/reference/potentials/tersoff/Si_Tersoff_1989.txt",
        tmp_path / "si.txt",
    )
    return n


@requires_reference
def test_cohesive_curve(tmp_path):
    n = make_si_dir(tmp_path)
    (tmp_path / "run.in").write_text(
        "potential si.txt\ncompute_cohesive 0.95 1.05 0\n"
    )
    Session(str(tmp_path), quiet=True).execute()
    data = np.loadtxt(tmp_path / "cohesive.out")
    assert data.shape == (101, 2)
    # minimum near factor 1.0 (equilibrium lattice)
    imin = np.argmin(data[:, 1])
    assert 0.99 < data[imin, 0] < 1.01
    # cohesive energy at minimum ~ -4.63 eV/atom
    assert np.isclose(data[imin, 1] / n, -4.63, atol=0.02)


@requires_reference
def test_elastic_constants(tmp_path):
    make_si_dir(tmp_path)
    (tmp_path / "run.in").write_text(
        "potential si.txt\ncompute_elastic 0.01 cubic\n"
    )
    Session(str(tmp_path), quiet=True).execute()
    lines = (tmp_path / "elastic.out").read_text().splitlines()
    c11, c12, c44 = [float(x) for x in lines[1].split()]
    # Tersoff(1989) silicon: C11 ~ 143 GPa, C12 ~ 75 GPa, C44(unrelaxed) ~ 119
    assert 100 < c11 < 180, c11
    assert 40 < c12 < 110, c12
    assert 60 < c44 < 160, c44
