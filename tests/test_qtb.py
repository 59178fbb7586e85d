"""QTB colored-noise thermostat: zero-point energy shows up as excess
kinetic temperature over the classical target (ref: ensemble_qtb.cu)."""

import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.qtb import NVTQTB, qtb_time_filter
from gpumd_tpu.integrate.run import MDRunner
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.units import HBAR, K_B, TIME_UNIT_CONVERSION


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


def test_filter_classical_limit():
    """At very high T the quantum spectrum reduces to white kB T noise:
    sum H^2 -> kB T (Parseval)."""
    dt = 5.0 / TIME_UNIT_CONVERSION
    for t in (30.0, 3000.0):
        h = qtb_time_filter(t, dt, 20.0, 64, 1)
        assert np.isfinite(h).all()
    # zero-point energy makes the quantum spectrum carry MORE power
    # than kB T; the ratio shrinks toward 1 as T grows
    h_cold = qtb_time_filter(30.0, dt, 20.0, 64, 1)
    h_hot = qtb_time_filter(3000.0, dt, 20.0, 64, 1)
    p_cold = (h_cold**2).sum() / (K_B * 30.0)
    p_hot = (h_hot**2).sum() / (K_B * 3000.0)
    assert p_cold > 2.0 * p_hot, (p_cold, p_hot)


def test_qtb_thermostats_above_classical():
    """Cold argon under QTB equilibrates ABOVE the classical target (the
    zero-point motion of ~1.5 THz phonons at 10 K is significant)."""
    state, ff = argon(t_init=10.0)
    dt = 5.0 / TIME_UNIT_CONVERSION
    ens = NVTQTB(temperature=10.0, coupling=50.0, dt=dt, f_max=10.0, n_f=64,
                 seed=5)
    runner = MDRunner(ff, ens, dt, 1500)
    final, _, th = runner(state)
    t = np.asarray(th.temperature)
    assert np.isfinite(t).all()
    t_mean = t[700:].mean()
    # classical thermostat would keep ~10 K; QTB adds zero-point KE
    assert t_mean > 13.0, t_mean
    assert t_mean < 120.0, t_mean  # and stays bounded


def test_qtb_app_keyword(tmp_path):
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([2 * a0] * 3), pbc=(True, True, True),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 10
time_step 5
ensemble nvt_qtb 10 10 100 f_max 10 N_f 32
run 50
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    assert np.isfinite(np.asarray(s.state.velocity)).all()


def test_npt_qtb_runs_and_relaxes(tmp_path):
    """npt_qtb: QTB thermostat + MTTK barostat; box responds to pressure
    (ref: ensemble_npt_qtb.cu)."""
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
        """potential lj.txt
velocity 20
time_step 5
ensemble npt_qtb temp 20 20 tperiod 50 f_max 10 N_f 30 iso 0.5 0.5 pperiod 300
dump_thermo 20
run 300
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    th = np.loadtxt(tmp_path / "thermo.out")
    assert np.isfinite(th).all()
    # box compressed under 0.5 GPa external pressure (dominates the
    # QTB zero-point thermal expansion)
    assert th[-1, 9] < th[0, 9]
    # QTB keeps a nonzero effective temperature (zero-point motion)
    assert th[-1, 0] > 3.0
