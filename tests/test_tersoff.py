"""Tersoff 1989: silicon diamond lattice physics + force consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.nve import NVE
from gpumd_tpu.integrate.run import MDRunner
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.tersoff import Tersoff1989
from gpumd_tpu.units import TIME_UNIT_CONVERSION

from conftest import requires_reference

A0 = 5.432  # Si diamond lattice constant


def diamond(nc, a0=A0, rattle=0.0, seed=0):
    base = np.array(
        [
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.25, 0.25, 0.25], [0.75, 0.75, 0.25],
            [0.75, 0.25, 0.75], [0.25, 0.75, 0.75],
        ]
    )
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    if rattle:
        pos += np.random.default_rng(seed).normal(0, rattle, pos.shape)
    return pos, np.array([nc * a0] * 3)


@pytest.fixture(scope="module")
def si_potential():
    return Tersoff1989.from_file(
        "/root/reference/potentials/tersoff/Si_Tersoff_1989.txt"
    )


@requires_reference
def test_silicon_cohesive_energy(si_potential):
    pos, lengths = diamond(2)
    n = len(pos)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 28.085), np.zeros(n, int), box)
    ff = ForceField.create([si_potential], box, n, mn=32)
    out = ff.compute(state)
    e_per_atom = float(jnp.sum(out.potential_energy)) / n
    # Tersoff (1989) silicon cohesive energy: -4.63 eV/atom
    assert np.isclose(e_per_atom, -4.63, atol=0.02), e_per_atom
    # perfect lattice: zero forces
    assert np.max(np.abs(np.asarray(out.force))) < 1e-9


@requires_reference
def test_forces_match_fd(si_potential):
    pos, lengths = diamond(2, rattle=0.08)
    n = len(pos)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 28.085), np.zeros(n, int), box)
    ff = ForceField.create([si_potential], box, n, mn=32)
    out = ff.compute(state)
    f = np.asarray(out.force)
    h = 1e-5
    for atom, comp in [(0, 0), (7, 1), (33, 2)]:
        pp = pos.copy(); pp[atom, comp] += h
        pm = pos.copy(); pm[atom, comp] -= h
        ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
        em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
        fd = -(ep - em) / (2 * h)
        assert np.isclose(f[atom, comp], fd, rtol=1e-5, atol=1e-8)


@requires_reference
def test_sige_mixed_potential():
    pot = Tersoff1989.from_file(
        "/root/reference/potentials/tersoff/SiGe_Tersoff_1989.txt"
    )
    pos, lengths = diamond(2, a0=5.5, rattle=0.05)
    n = len(pos)
    types = np.array([i % 2 for i in range(n)])  # alternating Si/Ge
    box = Box.orthogonal(lengths)
    mass = np.where(types == 0, 28.085, 72.63)
    state = make_state(pos, mass, types, box)
    ff = ForceField.create([pot], box, n, mn=32)
    out = ff.compute(state)
    assert np.isfinite(float(jnp.sum(out.potential_energy)))
    # FD check with mixed types
    f = np.asarray(out.force)
    h = 1e-5
    pp = pos.copy(); pp[5, 0] += h
    pm = pos.copy(); pm[5, 0] -= h
    ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
    em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
    assert np.isclose(f[5, 0], -(ep - em) / (2 * h), rtol=1e-5, atol=1e-8)


@requires_reference
def test_nve_conservation_tersoff(si_potential):
    pos, lengths = diamond(2)
    n = len(pos)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 28.085), np.zeros(n, int), box)
    state = initialize_velocity(state, 300.0, seed=4)
    ff = ForceField.create([si_potential], box, n, mn=32, skin=1.0)
    state = ff.compute(state)
    e0 = float(state.kinetic_energy() + jnp.sum(state.potential_energy))
    runner = MDRunner(ff, NVE(), 1.0 / TIME_UNIT_CONVERSION, 200)
    _, _, th = runner(state)
    etot = np.asarray(th.kinetic_energy + th.potential_energy)
    # smooth cutoff -> tight conservation
    assert np.max(np.abs(etot - e0)) < 2e-4 * n


@requires_reference
def test_tersoff_mini_silicon():
    from gpumd_tpu.potentials.tersoff import TersoffMini

    pot = TersoffMini.from_file(
        "/root/reference/potentials/tersoff/Si_Fan_2019.txt"
    )
    pos, lengths = diamond(2, rattle=0.05)
    n = len(pos)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 28.085), np.zeros(n, int), box)
    ff = ForceField.create([pot], box, n, mn=32)
    out = ff.compute(state)
    e = float(jnp.sum(out.potential_energy)) / n
    assert -5.0 < e < -3.5, e  # cohesive-scale energy
    f = np.asarray(out.force)
    h = 1e-5
    pp = pos.copy(); pp[4, 1] += h
    pm = pos.copy(); pm[4, 1] -= h
    ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
    em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
    assert np.isclose(f[4, 1], -(ep - em) / (2 * h), rtol=1e-5, atol=1e-8)


@requires_reference
def test_tersoff_1988_tin():
    from gpumd_tpu.potentials.tersoff import Tersoff1988

    pot = Tersoff1988.from_file(
        "/root/reference/potentials/tersoff/Sn_Cherukara_2016.txt"
    )
    # beta-tin-like test on a diamond lattice (just physics sanity + FD)
    pos, lengths = diamond(2, a0=6.5, rattle=0.06)
    n = len(pos)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 118.71), np.zeros(n, int), box)
    ff = ForceField.create([pot], box, n, mn=64)
    out = ff.compute(state)
    e = float(jnp.sum(out.potential_energy)) / n
    assert -5.0 < e < -1.0, e
    f = np.asarray(out.force)
    h = 1e-5
    for atom, comp in [(3, 0), (20, 2)]:
        pp = pos.copy(); pp[atom, comp] += h
        pm = pos.copy(); pm[atom, comp] -= h
        ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
        em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
        assert np.isclose(f[atom, comp], -(ep - em) / (2 * h), rtol=1e-5, atol=1e-8)
