"""Thermostat behavior: each NVT ensemble must hold the target temperature
on an LJ argon crystal (statistical gates, seeded)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.nvt import (
    NVTBAOAB,
    NVTBDP,
    NVTBerendsen,
    NVTLangevin,
    NVTNoseHooverChain,
)
from gpumd_tpu.integrate.run import MDRunner
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.units import TIME_UNIT_CONVERSION


def argon(nc=3, t_init=30.0):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    box = Box.orthogonal([nc * a0] * 3)
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    state = initialize_velocity(state, t_init, seed=11)
    lj = LJ.from_params(1.032e-2, 3.405, 9.0)
    ff = ForceField.create([lj], box, n, mn=160, skin=1.0)
    return ff.compute(state), ff


@pytest.mark.parametrize(
    "ens",
    [
        NVTBerendsen(t0=40.0, t1=40.0, coupling=100.0),
        NVTLangevin(t0=40.0, t1=40.0, coupling=100.0, seed=3),
        NVTBDP(t0=40.0, t1=40.0, coupling=100.0, seed=3),
        NVTNoseHooverChain(t0=40.0, t1=40.0, coupling=100.0),
        NVTBAOAB(t0=40.0, t1=40.0, coupling=100.0, seed=3),
    ],
    ids=["ber", "lan", "bdp", "nhc", "bao"],
)
def test_holds_target_temperature(ens):
    state, ff = argon()
    dt = 5.0 / TIME_UNIT_CONVERSION
    runner = MDRunner(ff, ens, dt, 800)
    final, _, th = runner(state)
    t = np.asarray(th.temperature)
    assert np.isfinite(t).all()
    mean_t = t[400:].mean()
    # crystal at 40 K, generous statistical gate
    assert 30.0 < mean_t < 50.0, mean_t


def test_temperature_ramp():
    state, ff = argon()
    dt = 5.0 / TIME_UNIT_CONVERSION
    ens = NVTLangevin(t0=20.0, t1=80.0, coupling=20.0, seed=1, n_steps=1000)
    runner = MDRunner(ff, ens, dt, 1000)
    final, _, th = runner(state)
    t = np.asarray(th.temperature)
    # late-run temperature clearly above early-run
    assert t[-100:].mean() > t[100:200].mean() + 20.0


def test_ttm_electron_phonon_equilibration(tmp_path):
    """TTM (ref: ensemble_ttm.cu): hot electrons (T_e = 600 K) heat the
    cold lattice through the e-ph coupling and T_e itself relaxes down."""
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
        groups=np.zeros((n, 1), int),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ttm 0 0 1.0e-5 1.0 1.0 5.0 0 100 2 2 2 600
dump_thermo 20
run 400
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    th = np.loadtxt(tmp_path / "thermo.out")
    assert np.isfinite(th).all()
    # lattice heated well above the initial 20 K by hot electrons
    assert th[-1, 0] > 60.0, th[-1, 0]
    # electron field cooled below its 600 K start (energy conservation)
    t_e = np.asarray(s._ens_aux["t_e"])
    assert np.isfinite(t_e).all()
    assert t_e.mean() < 600.0
