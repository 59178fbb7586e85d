"""MSST shock ensemble (ref: src/integrate/ensemble_msst.cu)."""

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.msst import MSST
from gpumd_tpu.integrate.run import MDRunner
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.units import TIME_UNIT_CONVERSION


def argon(nc=3, t_init=40.0):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    box = Box.orthogonal([nc * a0] * 3)
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    state = initialize_velocity(state, t_init, seed=7)
    lj = LJ.from_params(1.032e-2, 3.405, 9.0)
    ff = ForceField.create([lj], box, n, mn=160, skin=1.0)
    return ff.compute(state), ff


def test_msst_compresses_along_shock():
    state, ff = argon()
    dt = 2.0 / TIME_UNIT_CONVERSION
    # 3 km/s shock along x, tscale seeds the cell motion (as in practice)
    ens = MSST(shock_direction=0, vs=3.0, qmass=200.0, mu=5.0, tscale=0.05)
    runner = MDRunner(ff, ens, dt, 800)
    final, (aux, _), th = runner(state)
    assert bool(jnp.isfinite(final.position).all())
    lx0 = float(state.box.h[0, 0])
    lx1 = float(final.box.h[0, 0])
    ly1 = float(final.box.h[1, 1])
    assert lx1 < 0.995 * lx0, (lx0, lx1)  # compressed along x
    assert abs(ly1 - float(state.box.h[1, 1])) < 1e-9  # y untouched
    # conserved quantity should stay bounded (loose gate)
    e_cons, dhugo, dray = ens.conserved(final, aux)
    assert np.isfinite(float(e_cons))
    assert abs(float(dhugo)) < 500.0, float(dhugo)


def test_msst_app_keyword(tmp_path):
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0 = 5.26
    nc = 2
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
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 40
time_step 2
ensemble msst x 1.5 qmass 10000 mu 1
dump_thermo 50
run 200
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    data = np.atleast_2d(np.loadtxt(tmp_path / "thermo.out"))
    assert np.isfinite(data).all()


def _shock_slab(tmp_path, nx=8, nyz=2):
    """Elongated argon slab along x, non-periodic x."""
    import numpy as np
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nx) for j in range(nyz) for k in range(nyz)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nx * a0, nyz * a0, nyz * a0]),
        pbc=(False, True, True),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    return n, nx * a0


def test_wall_piston_drives_compression(tmp_path):
    """Piston atoms advance at vp; far wall stays frozen
    (ref: ensemble_wall_piston.cu)."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session

    n, lx = _shock_slab(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 10
time_step 2
ensemble wall_piston vp 10 thickness 6
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    x0 = np.asarray(s.frame.positions)[:, 0]
    x1 = np.asarray(s.state.position)[: n, 0]
    piston = x0 < 6.0
    frozen = x0 > lx - 6.0
    # piston moved right by vp * t = 0.1 A/fs * 200 fs = 20 A
    assert np.allclose(x1[piston] - x0[piston], 20.0, atol=0.5)
    # frozen wall did not move
    assert np.allclose(x1[frozen], x0[frozen], atol=1e-6)
    assert np.isfinite(x1).all()


def test_wall_mirror_reflects(tmp_path):
    """Mirror advances at vp and reflects atoms ahead of it
    (ref: ensemble_wall_mirror.cu)."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session

    n, lx = _shock_slab(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 10
time_step 2
ensemble wall_mirror vp 10 thickness 6
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    x1 = np.asarray(s.state.position)[: n, 0]
    # all atoms stay ahead of the mirror at x = 20 A
    assert (x1 > 20.0 - 1e-6).all() or np.isclose(x1.min(), 20.0, atol=0.5)
    assert np.isfinite(x1).all()


def test_wall_harmonic_pushes(tmp_path):
    """Harmonic wall pushes atoms; energy stays finite
    (ref: ensemble_wall_harmonic.cu)."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session

    n, lx = _shock_slab(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 10
time_step 2
ensemble wall_harmonic vp 5 k 2.0 thickness 6
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    x1 = np.asarray(s.state.position)[: n, 0]
    # wall at 10 A after 200 fs; most atoms pushed beyond it
    assert np.quantile(x1, 0.1) > 5.0
    assert np.isfinite(x1).all()


def test_dump_shock_nemd(tmp_path):
    """Spatial shock histograms written per dump (ref: dump_shock_nemd.cu)."""
    import numpy as np
    from gpumd_tpu.app.gpumd import Session

    n, lx = _shock_slab(tmp_path, nx=6)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 2
ensemble wall_piston vp 5 thickness 6
dump_shock_nemd interval 25 bin_size 5.0
run 50
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    t = np.loadtxt(tmp_path / "temperature_hist.txt")
    d = np.loadtxt(tmp_path / "density_hist.txt")
    vp = np.loadtxt(tmp_path / "vp_hist.txt")
    nbins = int(lx / 5.0) + 1
    assert t.shape == (2, nbins)
    assert d.shape == (2, nbins)
    assert np.isfinite(t).all() and (d >= 0).all()
    # argon density ~ 1.8 g/cm3 in occupied bins
    assert 1.0 < np.median(d[d > 0.5]) < 2.5
    # piston-adjacent bins move at ~vp = 0.5 km/s
    assert vp.max() > 0.2
