"""MTTK ensemble family: temperature/pressure control and extended-
Hamiltonian conservation (ref: src/integrate/ensemble_mttk.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.mttk import MTTK, TCHAIN
from gpumd_tpu.integrate.run import MDRunner
from gpumd_tpu.integrate.thermo import compute_thermo
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.units import K_B, TIME_UNIT_CONVERSION


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


def test_nvt_mttk_holds_temperature():
    state, ff = argon()
    dt = 5.0 / TIME_UNIT_CONVERSION
    ens = MTTK.nvt(40.0, 40.0, t_period=100.0)
    runner = MDRunner(ff, ens, dt, 800)
    final, _, th = runner(state)
    t = np.asarray(th.temperature)
    assert np.isfinite(t).all()
    assert 30.0 < t[400:].mean() < 50.0, t[400:].mean()


def test_nvt_mttk_conserved_quantity():
    """The MTTK conserved quantity H' = KE + U + sum 1/2 Q eta_dot^2
    + dof kT eta_0 + kT sum eta_n must drift far less than its thermostat
    exchanges energy."""
    state, ff = argon()
    dt = 2.0 / TIME_UNIT_CONVERSION
    t0 = 40.0
    ens = MTTK.nvt(t0, t0, t_period=50.0)
    dof = 3.0 * float(np.sum(np.asarray(state.mask)))
    t_freq = 1.0 / (50.0 * dt)

    def observer(s):
        th = compute_thermo(s)
        return th

    runner = MDRunner(ff, ens, dt, 400, observer=observer)
    aux0 = ens.init(state)
    final, (aux, _), th = runner(state, aux=aux0)

    # reconstruct conserved quantity at start and end
    def hprime(s, aux):
        ke = float(s.kinetic_energy())
        pe = float(jnp.sum(s.potential_energy * s.mask))
        q = K_B * t0 / (t_freq * t_freq)
        qs = [q * dof] + [q] * (TCHAIN - 1)
        eta_dot = np.asarray(aux["eta_dot"])[:TCHAIN]
        chain_ke = 0.5 * float(np.sum(np.asarray(qs) * eta_dot**2))
        eta = np.asarray(aux["eta"])
        chain_pe = dof * K_B * t0 * float(eta[0]) + K_B * t0 * float(
            np.sum(eta[1:])
        )
        return ke + pe + chain_ke + chain_pe

    h0 = hprime(state, aux0)
    h1 = hprime(final, aux)
    # thermostat pumps ~dof*kB*dT of energy; conserved quantity must move
    # far less than the kinetic energy scale itself
    ke_scale = dof * K_B * t0
    assert abs(h1 - h0) < 0.25 * ke_scale, (h0, h1, ke_scale)


@pytest.mark.parametrize("mode", ["iso", "aniso", "tri"])
def test_npt_mttk_relaxes_pressure(mode):
    state, ff = argon(nc=3, t_init=40.0)
    dt = 5.0 / TIME_UNIT_CONVERSION
    # target a compressive load: the box must shrink
    ens = MTTK.npt(40.0, 40.0, 0.2, 0.2, mode=mode,
                   t_period=100.0, p_period=500.0)
    runner = MDRunner(ff, ens, dt, 1500)
    final, _, th = runner(state)
    assert bool(jnp.isfinite(final.position).all())
    v0 = float(state.box.volume)
    v1 = float(final.box.volume)
    assert v1 < v0, (v0, v1)  # positive pressure compresses
    # pressure should approach the target (GPa); generous gate
    from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

    m = final.mask
    kin = jnp.einsum("n,na,nb->ab", final.mass * m, final.velocity,
                     final.velocity)
    w = jnp.einsum("nab,n->ab", final.virial, m)
    p = (kin + w) / final.box.volume * PRESSURE_UNIT_CONVERSION
    p_iso = float(jnp.trace(p) / 3.0)
    assert 0.0 < p_iso < 0.45, p_iso


def test_nph_mttk_runs():
    state, ff = argon(nc=3, t_init=40.0)
    dt = 5.0 / TIME_UNIT_CONVERSION
    ens = MTTK.nph(0.0, 0.0, mode="iso", p_period=500.0)
    runner = MDRunner(ff, ens, dt, 300)
    final, _, th = runner(state)
    assert bool(jnp.isfinite(final.position).all())
    assert np.isfinite(np.asarray(th.temperature)).all()


def test_app_parses_mttk():
    from gpumd_tpu.app.gpumd import Session

    app = Session.__new__(Session)
    ens = app._parse_mttk(
        "npt_mttk",
        "temp 300 300 tperiod 100 iso 10 10 pperiod 1000".split(),
    )
    assert ens.use_thermostat and ens.use_barostat
    assert ens.couple_type == 1  # XYZ
    assert ens.p_start[0][0] == 10.0
    ens = app._parse_mttk("nvt_mttk", "temp 300 500".split())
    assert ens.use_thermostat and not ens.use_barostat
    assert ens.t_stop == 500.0
    ens = app._parse_mttk(
        "npt_mttk", "temp 300 300 x 1 1 y 2 2 z 0 0".split()
    )
    assert ens.non_hydrostatic
    assert ens.p_start[1][1] == 2.0


def test_nphug_converges_toward_hugoniot(tmp_path):
    """NPHug (ref: ensemble_nphug.cu): uniaxial shock compression — the
    dynamic thermostat target follows dHugoniot and the box compresses
    along the loaded axis."""
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
ensemble nphug tperiod 100 pperiod 500 x 0.05 0.05
dump_thermo 20
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    th = np.loadtxt(tmp_path / "thermo.out")
    assert np.isfinite(th).all()
    # box compressed along x under 0.05 GPa load (cold curve: crystal at
    # ~0 GPa initially, so positive load shrinks Lx)
    lx0, lx1 = th[0, 9], th[-1, 9]
    assert lx1 < lx0
    # temperature rose from shock heating (Hugoniot target > initial 20 K)
    assert th[-1, 0] > th[0, 0] * 0.5
