"""AMBER NetCDF trajectory dump (ref: src/measure/dump_netcdf.cu)."""

import numpy as np

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def test_dump_netcdf(tmp_path):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar"] * n, positions=pos,
                 lattice=np.diag([2 * a0] * 3), pbc=(True, True, True)),
    )
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 40
time_step 5
ensemble nve
dump_netcdf -1 -1 5 1 traj.nc
run 20
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    from scipy.io import netcdf_file

    f = netcdf_file(str(tmp_path / "traj.nc"), "r", mmap=False)
    assert f.Conventions == b"AMBER"
    coords = f.variables["coordinates"]
    assert coords.shape == (4, n, 3)
    assert coords.units == b"angstrom"
    cl = f.variables["cell_lengths"][:]
    np.testing.assert_allclose(cl, 2 * a0, rtol=1e-12)
    ca = f.variables["cell_angles"][:]
    np.testing.assert_allclose(ca, 90.0, atol=1e-10)
    vel = f.variables["velocities"][:]
    assert np.abs(vel).max() > 0.01  # A/ps scale at 40 K
    t = f.variables["time"][:]
    np.testing.assert_allclose(t, [0.025, 0.05, 0.075, 0.1])
    f.close()


def test_plumed_not_installed(tmp_path):
    """Without libplumed the keyword fails with the reference's error."""
    import pytest

    from gpumd_tpu.measure.plumed_bridge import plumed_installed

    if plumed_installed():
        pytest.skip("libplumed present; graceful-error path not testable")
    a0 = 5.26
    pos = np.array([[0.0, 0, 0], [2.63, 2.63, 0]])
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar", "Ar"], positions=pos,
                 lattice=np.diag([a0] * 3), pbc=(True, True, True)),
    )
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 5.0\n")
    (tmp_path / "plumed.dat").write_text("d: DISTANCE ATOMS=1,2\n")
    (tmp_path / "run.in").write_text(
        "potential lj.txt\nvelocity 10\nplumed plumed.dat 1 0\nrun 2\n"
    )
    with pytest.raises(RuntimeError, match="PLUMED not installed"):
        Session(str(tmp_path), quiet=True).execute()


def test_dp_requires_deepmd(tmp_path):
    """The DP bridge fails with a clear install hint when deepmd-kit is
    absent (ref: dp.cu USE_DEEPMD gate)."""
    import pytest

    try:
        import deepmd  # noqa: F401
        pytest.skip("deepmd installed; error path not testable")
    except ImportError:
        pass
    pos = np.array([[0.0, 0, 0], [2.0, 0, 0]])
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Si", "Si"], positions=pos,
                 lattice=np.diag([8.0] * 3), pbc=(True, True, True)),
    )
    (tmp_path / "dp.txt").write_text("dp 1 Si\ngraph.pb\n")
    (tmp_path / "run.in").write_text("potential dp.txt\nrun 1\n")
    with pytest.raises(RuntimeError, match="deepmd-kit"):
        Session(str(tmp_path), quiet=True).execute()
