"""EAM Zhou 2004 / Dai 2006: copper fcc physics + force consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.eam import EAMDai2006, EAMZhou2004

from conftest import requires_reference

A0_CU = 3.615


def fcc(nc, a0):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    return pos, np.array([nc * a0] * 3)


def _system(pot, rattle=0.0, nc=3, a0=A0_CU, mass=63.546):
    pos, lengths = fcc(nc, a0)
    if rattle:
        pos += np.random.default_rng(1).normal(0, rattle, pos.shape)
    n = len(pos)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, mass), np.zeros(n, int), box)
    ff = ForceField.create([pot], box, n, mn=96)
    return state, ff, n


@requires_reference
def test_zhou_cu_cohesive_energy():
    pot = EAMZhou2004.from_file(
        "/root/reference/potentials/eam/Cu_Zhou_2004.txt"
    )
    state, ff, n = _system(pot)
    out = ff.compute(state)
    e = float(jnp.sum(out.potential_energy)) / n
    # Zhou 2004 Cu cohesive energy: ~-3.54 eV/atom
    assert np.isclose(e, -3.54, atol=0.05), e
    assert np.max(np.abs(np.asarray(out.force))) < 1e-8


@requires_reference
def test_zhou_forces_fd():
    pot = EAMZhou2004.from_file(
        "/root/reference/potentials/eam/Cu_Zhou_2004.txt"
    )
    state, ff, n = _system(pot, rattle=0.08)
    out = ff.compute(state)
    f = np.asarray(out.force)
    pos = np.asarray(state.position)
    h = 1e-5
    for atom, comp in [(0, 0), (17, 1), (50, 2)]:
        pp = pos.copy(); pp[atom, comp] += h
        pm = pos.copy(); pm[atom, comp] -= h
        ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
        em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
        fd = -(ep - em) / (2 * h)
        assert np.isclose(f[atom, comp], fd, rtol=1e-5, atol=1e-8)


@requires_reference
def test_zhou_multielement_mixing():
    pot = EAMZhou2004.from_file(
        "/root/reference/potentials/eam/eam_zhou_2004_CuFeNi.txt"
    )
    assert pot.re.shape[0] == 3
    pos, lengths = fcc(2, 3.6)
    n = len(pos)
    types = np.array([i % 3 for i in range(n)])
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 60.0), types, box)
    ff = ForceField.create([pot], box, n, mn=96)
    out = ff.compute(state)
    assert np.isfinite(float(jnp.sum(out.potential_energy)))
    f = np.asarray(out.force)
    pos0 = np.asarray(state.position)
    h = 1e-5
    pp = pos0.copy(); pp[3, 0] += h
    pm = pos0.copy(); pm[3, 0] -= h
    ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
    em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
    assert np.isclose(f[3, 0], -(ep - em) / (2 * h), rtol=1e-4, atol=1e-7)


@requires_reference
def test_dai_2006_loads_and_fd():
    pot = EAMDai2006.from_file(
        "/root/reference/potentials/eam/Cu_Dai_2006.txt"
    )
    state, ff, n = _system(pot, rattle=0.05)
    out = ff.compute(state)
    assert np.isfinite(float(jnp.sum(out.potential_energy)))
    f = np.asarray(out.force)
    pos = np.asarray(state.position)
    h = 1e-5
    pp = pos.copy(); pp[9, 2] += h
    pm = pos.copy(); pm[9, 2] -= h
    ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
    em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
    assert np.isclose(f[9, 2], -(ep - em) / (2 * h), rtol=1e-5, atol=1e-8)


@requires_reference
def test_eam_alloy_cuni():
    from gpumd_tpu.potentials.eam import EAMAlloy

    pot = EAMAlloy.from_file("/root/reference/potentials/eam/CuNi.eam.alloy")
    assert pot.symbols == ("Cu", "Ni")
    pos, lengths = fcc(2, 3.56)
    n = len(pos)
    types = np.array([i % 2 for i in range(n)])
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 0, 63.546, 58.6934), types, box)
    ff = ForceField.create([pot], box, n, mn=96)
    out = ff.compute(state)
    e = float(jnp.sum(out.potential_energy)) / n
    # CuNi alloy cohesive energy in the -3.5..-4.5 eV/atom ballpark
    assert -5.5 < e < -3.0, e
    # rattled FD check
    pos2 = pos + np.random.default_rng(0).normal(0, 0.05, pos.shape)
    state2 = state._replace(position=jnp.asarray(pos2))
    out2 = ff.compute(state2)
    f = np.asarray(out2.force)
    h = 1e-5
    pp = pos2.copy(); pp[7, 0] += h
    pm = pos2.copy(); pm[7, 0] -= h
    ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
    em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
    assert np.isclose(f[7, 0], -(ep - em) / (2 * h), rtol=1e-4, atol=1e-6)


@requires_reference
@pytest.mark.slow
def test_adp_tantalum():
    from gpumd_tpu.potentials.eam import ADP

    pot = ADP.from_file("/root/reference/potentials/adp/Ta.adp.txt")
    assert pot.symbols == ("Ta",)
    # bcc Ta, a0 = 3.31
    a0 = 3.31
    base = np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(3) for j in range(3) for k in range(3)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    box = Box.orthogonal([3 * a0] * 3)
    state = make_state(pos, np.full(n, 180.95), np.zeros(n, int), box)
    ff = ForceField.create([pot], box, n, mn=96)
    out = ff.compute(state)
    e = float(jnp.sum(out.potential_energy)) / n
    # Ta cohesive energy ~ -8.1 eV/atom
    assert np.isclose(e, -8.1, atol=0.3), e
    assert np.max(np.abs(np.asarray(out.force))) < 1e-6

    # FD on a rattled cell (exercises mu/lambda angular chains)
    pos2 = pos + np.random.default_rng(2).normal(0, 0.06, pos.shape)
    state2 = state._replace(position=jnp.asarray(pos2))
    out2 = ff.compute(state2)
    f = np.asarray(out2.force)
    h = 1e-5
    for atom, comp in [(0, 1), (23, 2)]:
        pp = pos2.copy(); pp[atom, comp] += h
        pm = pos2.copy(); pm[atom, comp] -= h
        ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
        em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
        assert np.isclose(f[atom, comp], -(ep - em) / (2 * h), rtol=1e-4, atol=1e-6)
