"""Phonon dispersion: Tersoff silicon along Gamma-X."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz

from conftest import requires_reference

A0 = 5.432


def make_si_primitive(tmp_path):
    lat = 0.5 * A0 * np.array([[0.0, 1, 1], [1, 0, 1], [1, 1, 0]])
    pos = np.array([[0.0, 0, 0], (lat[0] + lat[1] + lat[2]) / 4.0])
    frame = XYZFrame(
        symbols=["Si", "Si"], positions=pos, lattice=lat, pbc=(True,) * 3
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    import shutil

    shutil.copy(
        "/root/reference/potentials/tersoff/Si_Tersoff_1989.txt",
        tmp_path / "si.txt",
    )
    (tmp_path / "kpoints.in").write_text(
        "0.0 0.0 0.0 G\n0.5 0.0 0.5 X\n"
    )


@requires_reference
def test_silicon_dispersion(tmp_path):
    make_si_primitive(tmp_path)
    (tmp_path / "run.in").write_text(
        "potential si.txt\nreplicate 4 4 4\ncompute_phonon 0.01\n"
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    lines = (tmp_path / "omega2.out").read_text().splitlines()
    assert lines[0].startswith("#")
    data = np.loadtxt(tmp_path / "omega2.out", comments="#")
    assert data.shape == (101, 7)  # kpath + 6 branches
    gamma = data[0, 1:]
    # acoustic branches vanish at Gamma
    assert np.all(np.abs(gamma[:3]) < 5.0), gamma
    # optical branch at Gamma: Tersoff Si ~ 17.5 THz -> omega^2 ~ 1.2e4 rad^2/ps^2
    assert 8.0e3 < gamma[5] < 1.6e4, gamma
    # all branches real (omega^2 >= small negative numerical noise)
    assert data[:, 1:].min() > -5.0
    # dispersion: acoustic branch grows away from Gamma
    assert data[50, 1] > 100.0
