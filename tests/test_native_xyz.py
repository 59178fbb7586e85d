"""Native C++ extended-XYZ fast path (gpumd_tpu/native/xyz_native.cpp)."""

import numpy as np
import pytest

import gpumd_tpu.io.xyz as X
from gpumd_tpu.io.xyz import XYZFrame, read_xyz, write_xyz
from gpumd_tpu.native import xyz_native


@pytest.mark.skipif(xyz_native() is None, reason="no C++ toolchain")
def test_native_roundtrip_matches_python(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    n = 6000  # above _NATIVE_MIN_ROWS
    frame = XYZFrame(
        symbols=(["Si", "O"] * (n // 2)),
        positions=rng.uniform(0, 50, (n, 3)),
        lattice=np.diag([50.0] * 3),
        velocities=rng.normal(0, 0.1, (n, 3)),
        masses=np.full(n, 28.085),
        groups=rng.integers(0, 3, (n, 2)),
    )
    write_xyz(str(tmp_path / "native.xyz"), frame, with_velocities=True,
              with_masses=True, with_groups=True)
    monkeypatch.setattr(X, "_NATIVE_MIN_ROWS", 10**12)
    write_xyz(str(tmp_path / "python.xyz"), frame, with_velocities=True,
              with_masses=True, with_groups=True)
    fp = read_xyz(str(tmp_path / "python.xyz"))
    monkeypatch.undo()
    fn = read_xyz(str(tmp_path / "native.xyz"))
    assert fn.symbols == fp.symbols == list(frame.symbols)
    np.testing.assert_allclose(fn.positions, frame.positions, rtol=1e-14)
    np.testing.assert_allclose(fn.velocities, frame.velocities, rtol=1e-14)
    np.testing.assert_allclose(fn.masses, frame.masses)
    np.testing.assert_array_equal(fn.groups, frame.groups)
    np.testing.assert_allclose(fn.positions, fp.positions, rtol=1e-14)


@pytest.mark.skipif(xyz_native() is None, reason="no C++ toolchain")
def test_native_reader_used_for_model_files(tmp_path):
    """A large model.xyz parses through the native path byte-exactly."""
    n = 5000
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 40, (n, 3))
    with open(tmp_path / "model.xyz", "w") as f:
        f.write(f"{n}\n")
        f.write('Lattice="40 0 0 0 40 0 0 0 40" '
                'Properties=species:S:1:pos:R:3 pbc="T T T"\n')
        for i in range(n):
            f.write(f"C {pos[i, 0]:.10f} {pos[i, 1]:.10f} {pos[i, 2]:.10f}\n")
    fr = read_xyz(str(tmp_path / "model.xyz"))
    assert fr.n_atoms == n
    np.testing.assert_allclose(fr.positions, pos, atol=1e-9)
