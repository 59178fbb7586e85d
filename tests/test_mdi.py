"""MDI engine mode (ref: src/main_mdi/run.cu:355-480)."""

import numpy as np
import pytest

from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _setup(tmp_path):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([2 * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        "potential lj.txt\nvelocity 20\ntime_step 5\nensemble nve\n"
    )
    return n, pos


def test_mdi_engine_roundtrip(tmp_path):
    from gpumd_tpu.app.mdi import BOHR, HARTREE, MDIEngine

    n, pos = _setup(tmp_path)
    eng = MDIEngine(str(tmp_path))
    assert eng.get_natoms() == n
    # coords round-trip in Bohr
    c = eng.get_coords()
    assert np.allclose(c * BOHR, pos, atol=1e-8)
    e0 = eng.get_energy()
    assert np.isfinite(e0) and e0 < 0.0  # cohesive, Hartree
    f = eng.get_forces()
    assert f.shape == (n, 3)
    assert np.allclose(f, 0.0, atol=1e-6)  # perfect lattice

    # displace one atom via >COORDS: forces appear, energy rises
    c2 = c.copy()
    c2[0, 0] += 0.4 / BOHR
    eng.set_coords(c2)
    e1 = eng.get_energy()
    assert e1 > e0
    f1 = eng.get_forces()
    assert abs(f1[0, 0]) > 1e-5
    # stress available
    s = eng.get_stress()
    assert s.shape == (3, 3) and np.isfinite(s).all()

    # step-one MD control
    eng.set_coords(c)
    eng.init_md()
    x_before = eng.get_coords()
    eng.step(5)
    x_after = eng.get_coords()
    assert not np.allclose(x_before, x_after)


def test_mdi_libmdi_bridge(tmp_path):
    """serve_libmdi drives the reference's exact MDI command loop through a
    ctypes-loaded MDI library.  A compiled C stub (standing in for
    libmdi.so, like the reference's own mdi_stub build) scripts a driver
    session <NATOMS -> <FORCES -> <ENERGY -> EXIT and records everything
    the engine sent; the recording must match direct MDIEngine values."""
    import ctypes
    import struct
    import subprocess

    stub_c = tmp_path / "fake_mdi.c"
    stub_c.write_text(r"""
#include <string.h>
#include <stdio.h>
#include <stdlib.h>
const int MDI_COMMAND_LENGTH_ = 12;
const int MDI_INT_ = 0;
const int MDI_DOUBLE_ = 1;
static int step_ = 0;
static FILE* out_;
int MDI_Init(const char* opts) {
  const char* p = getenv("FAKE_MDI_OUT");
  out_ = fopen(p ? p : "/tmp/fake_mdi.bin", "wb");
  return out_ ? 0 : 1;
}
int MDI_Register_node(const char* n) { return 0; }
int MDI_Register_command(const char* n, const char* c) { return 0; }
int MDI_Accept_communicator(int* comm) { *comm = 1; return 0; }
int MDI_Recv_command(char* buf, int comm) {
  const char* seq[] = {"<NATOMS", "<FORCES", "<ENERGY", "EXIT"};
  if (step_ >= 4) return 1;
  memset(buf, 0, 12);
  strncpy(buf, seq[step_++], 11);
  return 0;
}
int MDI_Send(const void* data, int count, int dtype, int comm) {
  int bytes = count * (dtype == MDI_DOUBLE_ ? 8 : 4);
  fwrite(&count, 4, 1, out_);
  fwrite(&dtype, 4, 1, out_);
  fwrite(data, 1, bytes, out_);
  fflush(out_);
  return 0;
}
int MDI_Recv(void* data, int count, int dtype, int comm) {
  memset(data, 0, count * (dtype == MDI_DOUBLE_ ? 8 : 4));
  return 0;
}
""")
    so = tmp_path / "libfake_mdi.so"
    subprocess.run(
        ["cc", "-shared", "-fPIC", "-o", str(so), str(stub_c)], check=True
    )

    n, pos = _setup(tmp_path)
    rec = tmp_path / "mdi_record.bin"
    import os

    os.environ["FAKE_MDI_OUT"] = str(rec)
    from gpumd_tpu.app.mdi import MDIEngine, serve_libmdi

    served = serve_libmdi(str(tmp_path), lib_path=str(so))
    assert served == 4

    eng = MDIEngine(str(tmp_path))
    data = rec.read_bytes()
    off = 0

    def read_msg():
        nonlocal off
        count, dtype = struct.unpack_from("<ii", data, off)
        off += 8
        fmt = "d" if dtype == 1 else "i"
        size = count * (8 if dtype == 1 else 4)
        vals = np.frombuffer(data[off:off + size],
                             np.float64 if dtype == 1 else np.int32)
        off += size
        return vals

    natoms = read_msg()
    assert natoms[0] == n
    forces = read_msg().reshape(n, 3)
    np.testing.assert_allclose(forces, eng.get_forces(), atol=1e-12)
    energy = read_msg()
    assert abs(energy[0] - eng.get_energy()) < 1e-12
