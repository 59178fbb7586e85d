"""LSQT quantum transport (ref: src/measure/lsqt.cu)."""

import numpy as np
import pytest

from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _graphene(tmp_path, nx=6, ny=4):
    """Periodic graphene sheet (armchair cell, a = 1.42 A bonds)."""
    a = 1.42
    # 4-atom rectangular cell
    cell = np.array([[0, 0, 0], [a, 0, 0], [1.5 * a, np.sqrt(3) / 2 * a, 0],
                     [2.5 * a, np.sqrt(3) / 2 * a, 0]])
    lx, ly = 3 * a, np.sqrt(3) * a
    pos = []
    for i in range(nx):
        for j in range(ny):
            pos.extend(cell + np.array([i * lx, j * ly, 0.0]))
    pos = np.asarray(pos)
    n = len(pos)
    frame = XYZFrame(
        symbols=["C"] * n, positions=pos,
        lattice=np.diag([nx * lx, ny * ly, 10.0]),
        pbc=(True, True, False),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    # Tersoff carbon for the MD part
    src = "/root/reference/potentials/tersoff/Tersoff_1989_C.txt"
    import os
    if os.path.exists(src):
        import shutil
        shutil.copy(src, tmp_path / "pot.txt")
        return n, "pot.txt"
    (tmp_path / "lj.txt").write_text("lj 1 C\n2.4e-3 3.4 8.0\n")
    return n, "lj.txt"


def test_lsqt_graphene_dos(tmp_path):
    """Graphene pi-band DOS from KPM: V-shaped dip at E = 0, finite
    bandwidth ~ 3|t|, positive everywhere (ref: lsqt.cu KPM machinery)."""
    from gpumd_tpu.app.gpumd import Session

    n, pot = _graphene(tmp_path)
    (tmp_path / "run.in").write_text(
        f"""potential {pot}
time_step 1
ensemble nve
compute_lsqt x 500 201 -9 9 10
run 2
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    dos = np.loadtxt(tmp_path / "lsqt_dos.out")
    assert dos.shape == (2, 201)
    d = dos[0]
    e = np.linspace(-9, 9, 201)
    assert np.isfinite(d).all()
    # DOS essentially positive (KPM ringing may give tiny negatives)
    assert d.min() > -0.02
    # Dirac dip: DOS near E=0 well below the van-Hove region (|E|~2.7)
    i0 = np.argmin(np.abs(e))
    ivh = np.argmin(np.abs(e - 2.7))
    assert d[i0] < 0.5 * d[ivh]
    # band edges: negligible DOS beyond |E| > 3|t| + resolution
    assert np.abs(d[np.abs(e) > 8.6]).max() < 0.02
    # normalization: integral over the band = 2 states/atom (pi band with
    # spin — the reference's 2/pi KPM prefactor, lsqt.cu:409-412)
    integral = np.trapezoid(np.clip(d, 0, None), e)
    assert 1.7 < integral < 2.3, integral

    vel = np.loadtxt(tmp_path / "lsqt_velocity.out")
    assert vel.shape == (2, 201)
    assert np.isfinite(vel).all()
    # Fermi velocity near the Dirac point ~ 1e6 m/s ballpark
    assert 1e5 < vel[0, i0] < 3e6

    sig = np.loadtxt(tmp_path / "lsqt_sigma.out")
    assert sig.shape == (2, 201)
    assert np.isfinite(sig).all()


def test_lsqt_sp3_dos(tmp_path):
    """sp3 4-orbital carbon model (ref: lsqt.cu:554-643): DOS integrates
    to ~8 states/atom (4 orbitals x spin) over the full band."""
    n, pot = _graphene(tmp_path)
    (tmp_path / "run.in").write_text(
        f"""potential {pot}
velocity 300
time_step 1
ensemble nve
compute_lsqt x 500 301 -25 25 30 sp3
run 1
"""
    )
    from gpumd_tpu.app.gpumd import Session

    s = Session(str(tmp_path), quiet=True)
    s.execute()
    d = np.loadtxt(tmp_path / "lsqt_dos.out")
    e = np.linspace(-25, 25, 301)
    assert np.isfinite(d).all()
    integral = np.trapezoid(np.clip(d[0] if d.ndim > 1 else d, 0, None), e)
    assert 6.8 < integral < 9.2, integral
