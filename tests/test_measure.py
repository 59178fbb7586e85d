"""Measure pipeline: HAC/HNEMD/MSD/SDC/DOS/RDF through the app driver."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session

from test_app_gpumd import make_argon_dir


def test_hac_green_kubo(tmp_path):
    make_argon_dir(tmp_path, nc=3)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 40
time_step 5
ensemble nve
compute_hac 5 20 2
run 400
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    hac = np.loadtxt(tmp_path / "hac.out")
    assert hac.shape == (10, 11)  # Nc/output_interval rows; t + 5 hac + 5 rtc
    assert np.isfinite(hac).all()
    # HAC at zero-ish lag should be positive for diagonal terms
    assert hac[0, 1] > 0 and hac[0, 3] > 0 and hac[0, 5] > 0


def test_hnemd_kappa(tmp_path):
    make_argon_dir(tmp_path, nc=3)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 40
time_step 5
ensemble nvt_lan 40 40 100
compute_hnemd 100 0.00001 0 0
run 300
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    kappa = np.loadtxt(tmp_path / "kappa.out")
    assert kappa.shape == (3, 5)
    assert np.isfinite(kappa).all()
    # driving force must be reset after the run
    assert s.ff.hnemd_fe is None


def test_msd_and_sdc(tmp_path):
    make_argon_dir(tmp_path, nc=3)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 60
time_step 5
ensemble nve
compute_msd 5 10
compute_sdc 5 10
run 200
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    msd = np.loadtxt(tmp_path / "msd.out")
    assert msd.shape[1] == 7
    # MSD grows with lag in a warm crystal
    assert msd[-1, 1] > 0
    sdc = np.loadtxt(tmp_path / "sdc.out")
    assert sdc.shape[1] == 7
    # VAC(0) = <v_x^2> > 0
    assert sdc[0, 1] > 0


def test_shc(tmp_path):
    make_argon_dir(tmp_path, nc=3)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 40
time_step 5
ensemble nve
compute_shc 2 100 0 50 40.0
run 400
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    lines = (tmp_path / "shc.out").read_text().splitlines()
    header = [l for l in lines if l.startswith("#")]
    assert any("columns_shc" in l for l in header)
    data = np.loadtxt(tmp_path / "shc.out", comments="#")
    # 2*Nc-1 correlation rows + num_omega spectral rows
    assert data.shape == (2 * 100 - 1 + 50, 3)
    assert np.isfinite(data).all()
    # K(0) row (t=0) should be the largest in-plane correlation magnitude
    corr = data[: 2 * 100 - 1]
    i0 = np.argmin(np.abs(corr[:, 0]))
    assert np.abs(corr[i0, 1]) >= np.abs(corr[:, 1]).max() * 0.5


def test_dos_and_rdf(tmp_path):
    make_argon_dir(tmp_path, nc=3)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 60
time_step 5
ensemble nve
compute_dos 5 20 30
compute_rdf 8.0 50 25
run 200
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    dos = np.loadtxt(tmp_path / "dos.out")
    assert dos.shape == (20, 4)
    assert np.isfinite(dos).all()
    mvac = np.loadtxt(tmp_path / "mvac.out")
    assert np.isclose(mvac[0, 1:].sum(), 3.0, atol=0.2)  # normalized VAC(0)
    rdf = np.loadtxt(tmp_path / "rdf.out")
    assert rdf.shape == (50, 2)
    # fcc argon first-shell peak near 3.72 A
    peak_r = rdf[np.argmax(rdf[:, 1]), 0]
    assert 3.3 < peak_r < 4.1
    # g(r) ~ 0 well inside the core
    assert rdf[rdf[:, 0] < 2.5, 1].max() < 0.1


def test_viscosity(tmp_path):
    make_argon_dir(tmp_path, nc=3)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 60
time_step 5
ensemble nvt_ber 60 60 100
compute_viscosity 5 20
run 300
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    data = np.loadtxt(tmp_path / "viscosity.out")
    assert data.shape == (20, 13)
    assert np.isfinite(data).all()
    # shear correlation at lag 0 positive
    assert data[0, 4] > 0


def test_compute_chunk(tmp_path):
    """Spatial chunk binning (ref: compute_chunk.cu): 1-D bins along x with
    temperature, number density, and vx columns."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0, nc = 5.26, 3
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        f"""potential lj.txt
velocity 40
time_step 5
ensemble nve
compute_chunk 5 10 bin/1d x lower {a0} temperature density/number vx
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.loadtxt(tmp_path / "compute_chunk.out")
    # 3 bins x 2 output windows; columns: id coord count T rho vx
    assert data.shape == (6, 6)
    assert np.allclose(data[:3, 0], [0, 1, 2])
    assert np.allclose(data[:3, 1], [a0 / 2, 1.5 * a0, 2.5 * a0])
    # homogeneous crystal: each bin holds n/3 atoms on average
    assert np.allclose(data[:, 2], n / 3, atol=n * 0.05)
    # number density = 4 atoms per a0^3 cell
    assert np.allclose(data[:, 4], 4.0 / a0**3, rtol=0.2)
    # temperatures plausible (run started at 40 K)
    assert (data[:, 3] > 5.0).all() and (data[:, 3] < 60.0).all()


def test_gkma_mode_completeness(tmp_path):
    """With a complete orthonormal eigenbasis (identity modes), the summed
    modal heat current equals the total heat current component-wise
    (ref: modal_analysis.cu compute_heat)."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0, nc = 5.26, 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")

    # identity eigenbasis: 3n modes; mode m has e_c[i] = delta(3i+c == m).
    # File layout: 3n omega^2 floats, then per mode [ex(n), ey(n), ez(n)].
    nm = 3 * n
    buf = [np.arange(1, nm + 1, dtype=np.float32)]  # fake ascending omega^2
    for mode in range(nm):
        e = np.zeros((3, n), np.float32)
        e[mode % 3, mode // 3] = 1.0
        buf.append(e.reshape(-1))
    np.concatenate(buf).tofile(tmp_path / "eigenvector.in")

    (tmp_path / "run.in").write_text(
        f"""potential lj.txt
velocity 40
time_step 5
ensemble nve
compute_gkma 10 1 {nm} bin_size 1
run 20
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.loadtxt(tmp_path / "heatmode.out")
    assert data.shape == (2 * nm, 5)
    jm = data[:nm]  # first sample, one bin per mode
    # completeness: sum over modes = total per-atom heat current sums
    state = s.state
    mask = np.asarray(state.mask) > 0
    v = np.asarray(state.velocity)[mask]
    w = np.asarray(state.virial)[mask]
    # use the SECOND sample (state at step 20 == final state)
    jm2 = data[nm:]
    jxi = float(np.sum(w[:, 0, 0] * v[:, 0] + w[:, 0, 1] * v[:, 1]))
    jxo = float(np.sum(w[:, 0, 2] * v[:, 2]))
    jz = float(np.sum(w[:, 2, 0] * v[:, 0] + w[:, 2, 1] * v[:, 1]
                      + w[:, 2, 2] * v[:, 2]))
    assert np.isclose(jm2[:, 0].sum(), jxi, rtol=1e-4, atol=1e-8)
    assert np.isclose(jm2[:, 1].sum(), jxo, rtol=1e-4, atol=1e-8)
    assert np.isclose(jm2[:, 4].sum(), jz, rtol=1e-4, atol=1e-8)


def test_hnema_runs(tmp_path):
    """HNEMA accumulates and scales modal kappa (kappamode.out)."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0, nc = 5.26, 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    nm = 3 * n
    buf = [np.arange(1, nm + 1, dtype=np.float32)]
    rng = np.random.default_rng(0)
    for mode in range(nm):
        e = rng.normal(size=3 * n).astype(np.float32)
        buf.append(e / np.linalg.norm(e))
    np.concatenate(buf).tofile(tmp_path / "eigenvector.in")
    (tmp_path / "run.in").write_text(
        f"""potential lj.txt
velocity 40
time_step 5
ensemble nvt_lan 40 40 100
compute_hnema 5 20 0.0001 0 0 1 {nm} bin_size 8
run 40
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    data = np.loadtxt(tmp_path / "kappamode.out")
    nbins = int(np.ceil(nm / 8))
    assert data.shape == (2 * nbins, 5)
    assert np.isfinite(data).all()


def test_dump_cg(tmp_path):
    """Coarse-grained bead dump: COM positions + averaged bead forces and
    the missing-DoF virial correction (ref: dump_cg.cu)."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz
    from gpumd_tpu.io.xyz import read_xyz_frames

    a0, nc = 5.26, 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    beads = (np.arange(n) // 4)[:, None]  # one bead per fcc cell
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True,) * 3, groups=beads,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 30
time_step 5
ensemble nve
dump_cg 10 0
run 30
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    frames = read_xyz_frames(str(tmp_path / "train.xyz"))
    assert len(frames) == 3
    f0 = frames[0]
    assert f0.n_atoms == n // 4
    assert "energy" in f0.info and "virial" in f0.info
    assert f0.forces is not None and np.isfinite(f0.forces).all()
    # bead COMs sit near the fcc cell centers
    assert np.isfinite(f0.positions).all()


def test_angular_rdf(tmp_path):
    """g(r, theta) for an isotropic liquid-like config is approximately
    theta-independent and integrates like the plain RDF
    (ref: angular_rdf.cu)."""
    import numpy as np

    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(3) for j in range(3) for k in range(3)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar"] * n, positions=pos,
                 lattice=np.diag([3 * a0] * 3), pbc=(True, True, True)),
    )
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 60
time_step 5
ensemble nvt_ber 60 60 100
compute_angular_rdf 6.0 40 24 20
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    rows = np.genfromtxt(tmp_path / "angular_rdf.out", skip_header=1)
    assert rows.shape == (40 * 24, 3)
    g = rows[:, 2].reshape(40, 24)
    assert np.isfinite(g).all()
    # first-shell peak near r = 3.7 A in every theta sector
    r = rows[::24, 0]
    peak_bin = np.argmax(g.mean(axis=1))
    assert 3.0 < r[peak_bin] < 4.5
    # isotropy: theta-average variance of the peak bin is moderate
    gp = g[peak_bin]
    assert gp.std() / max(gp.mean(), 1e-9) < 1.0
