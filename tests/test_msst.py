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
