import numpy as np
import pytest

from gpumd_tpu.io.xyz import XYZFrame, read_xyz, read_xyz_frames, write_xyz

from conftest import requires_reference


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 7
    frame = XYZFrame(
        symbols=["Si"] * 4 + ["C"] * 3,
        positions=rng.uniform(0, 5, (n, 3)),
        lattice=np.diag([5.0, 5.0, 5.0]),
        pbc=(True, True, False),
        velocities=rng.normal(size=(n, 3)),
        masses=np.array([28.085] * 4 + [12.011] * 3),
        groups=np.array([[i % 2] for i in range(n)]),
    )
    p = str(tmp_path / "model.xyz")
    write_xyz(p, frame, with_velocities=True, with_masses=True, with_groups=True)
    back = read_xyz(p)
    assert back.symbols == frame.symbols
    assert np.allclose(back.positions, frame.positions)
    assert np.allclose(back.velocities, frame.velocities)
    assert np.allclose(back.masses, frame.masses)
    assert back.groups is not None and back.groups.shape == (n, 1)
    assert np.all(back.groups == frame.groups)
    assert back.pbc == (True, True, False)
    assert np.allclose(back.lattice, frame.lattice)


def test_default_masses():
    frame = XYZFrame(symbols=["C", "Si"], positions=np.zeros((2, 3)))
    assert np.allclose(frame.default_masses(), [12.011, 28.085])


@requires_reference
def test_read_reference_fixture():
    f = read_xyz(
        "/root/reference/tests_pytest/fixtures/structures/C-nat16-rattled.xyz"
    )
    assert f.n_atoms == 16
    assert f.symbols[0] == "C"
    assert f.pbc == (True, True, True)
    assert f.lattice is not None


@requires_reference
def test_read_train_frames_with_energy_forces():
    frames = read_xyz_frames(
        "/root/reference/examples/gpumd_dynamic/model.xyz", max_frames=1
    )
    f = frames[0]
    assert f.n_atoms == 250
    assert f.forces is not None and f.forces.shape == (250, 3)
