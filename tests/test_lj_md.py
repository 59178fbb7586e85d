"""End-to-end slice: LJ argon, NVE.  Mirrors the reference test strategy
(tests_pytest/test_force_energy_consistency.py, test_md_conservation.py,
test_invariances.py) with tighter CPU-f64 tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.nve import NVE
from gpumd_tpu.integrate.run import md_run
from gpumd_tpu.integrate.thermo import compute_thermo
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.units import K_B, TIME_UNIT_CONVERSION

EPS_AR = 1.032e-2
SIG_AR = 3.405
RC_AR = 9.0
A0 = 5.26  # fcc argon lattice constant


def fcc(nx, ny, nz, a0=A0):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nx) for j in range(ny) for k in range(nz)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    return pos, np.array([nx, ny, nz]) * a0


def argon_system(nx=3, ny=3, nz=3, rattle=0.0, seed=0):
    pos, lengths = fcc(nx, ny, nz)
    if rattle:
        pos = pos + np.random.default_rng(seed).normal(0, rattle, pos.shape)
    n = len(pos)
    box = Box.orthogonal(lengths)
    state = make_state(
        position=pos, mass=np.full(n, 39.948), type_=np.zeros(n, int), box=box
    )
    lj = LJ.from_params(EPS_AR, SIG_AR, RC_AR)
    ff = ForceField.create([lj], box, n, mn=128)
    return state, ff


def test_forces_match_finite_difference():
    state, ff = argon_system(2, 2, 2, rattle=0.1)
    state = ff.compute(state)
    f = np.asarray(state.force)
    e0 = float(jnp.sum(state.potential_energy))
    h = 1e-5
    for atom, comp in [(0, 0), (3, 1), (17, 2), (31, 0)]:
        for sgn in (1,):
            pos_p = np.asarray(state.position).copy()
            pos_p[atom, comp] += h
            pos_m = np.asarray(state.position).copy()
            pos_m[atom, comp] -= h
            ep = float(
                jnp.sum(ff.compute(state._replace(position=jnp.asarray(pos_p))).potential_energy)
            )
            em = float(
                jnp.sum(ff.compute(state._replace(position=jnp.asarray(pos_m))).potential_energy)
            )
            fd = -(ep - em) / (2 * h)
            assert np.isclose(f[atom, comp], fd, rtol=1e-6, atol=1e-8), (
                atom,
                comp,
                f[atom, comp],
                fd,
            )


def test_translation_invariance():
    state, ff = argon_system(2, 2, 2, rattle=0.05)
    out0 = ff.compute(state)
    shifted = state._replace(position=state.position + jnp.asarray([1.3, -2.7, 0.9]))
    out1 = ff.compute(shifted)
    assert np.allclose(
        np.asarray(out0.potential_energy), np.asarray(out1.potential_energy), atol=1e-10
    )
    assert np.allclose(np.asarray(out0.force), np.asarray(out1.force), atol=1e-10)


def test_permutation_invariance():
    state, ff = argon_system(2, 2, 2, rattle=0.05)
    out0 = ff.compute(state)
    perm = np.random.default_rng(3).permutation(state.position.shape[0])
    permuted = state._replace(
        position=state.position[perm],
        mass=state.mass[perm],
        type=state.type[perm],
        velocity=state.velocity[perm],
    )
    out1 = ff.compute(permuted)
    assert np.allclose(
        np.asarray(out0.potential_energy)[perm],
        np.asarray(out1.potential_energy),
        atol=1e-10,
    )
    assert np.allclose(np.asarray(out0.force)[perm], np.asarray(out1.force), atol=1e-10)


def test_newton_third_law():
    state, ff = argon_system(2, 2, 2, rattle=0.05)
    out = ff.compute(state)
    total_f = np.asarray(jnp.sum(out.force, axis=0))
    assert np.allclose(total_f, 0.0, atol=1e-9)


def test_virial_matches_strain_derivative():
    """Total virial W = -dE/d(eps) under uniform strain."""
    state, ff = argon_system(2, 2, 2, rattle=0.05)
    out = ff.compute(state)
    w_total = np.asarray(jnp.sum(out.virial, axis=0))

    h = 1e-6
    for a in range(3):
        eps_p = np.eye(3)
        eps_p[a, a] += h
        eps_m = np.eye(3)
        eps_m[a, a] -= h

        def energy_strained(strain):
            pos = state.position @ jnp.asarray(strain).T
            box = state.box.with_h(jnp.asarray(strain) @ state.box.h)
            st = state._replace(position=pos, box=box)
            ff2 = ForceField.create(
                [LJ.from_params(EPS_AR, SIG_AR, RC_AR)], box, pos.shape[0], mn=128
            )
            return float(jnp.sum(ff2.compute(st).potential_energy))

        fd = -(energy_strained(eps_p) - energy_strained(eps_m)) / (2 * h)
        assert np.isclose(w_total[a, a], fd, rtol=1e-5, atol=1e-6), (
            a,
            w_total[a, a],
            fd,
        )


def test_nve_conservation():
    """200-step NVE: energy drift and momentum bounds from the reference
    gate (test_md_conservation.py: 2e-3 eV/fs^2/atom * dt^2 * N; momentum
    1e-3 amu*A/fs), tightened for f64."""
    state, ff = argon_system(3, 3, 3)
    n = int(np.asarray(jnp.sum(state.mask)))
    state = initialize_velocity(state, 60.0, seed=777)
    state = ff.compute(state)

    dt_fs = 5.0
    dt = dt_fs / TIME_UNIT_CONVERSION
    e0 = float(compute_thermo(state).kinetic_energy + jnp.sum(state.potential_energy))

    final, _, thermo = md_run(state, ff, NVE(), dt, 200)
    etot = np.asarray(thermo.kinetic_energy + thermo.potential_energy)
    drift = np.max(np.abs(etot - e0))
    # Reference gate (coeff 2e-3 eV/fs^2/atom); the unshifted hard LJ cutoff
    # leaks ~1e-4 eV per neighbor crossing exactly as the reference does.
    assert drift < 2e-3 * dt_fs**2 * n, f"energy drift {drift} eV"

    p = np.asarray(
        jnp.sum(final.mass[:, None] * final.velocity * final.mask[:, None], axis=0)
    )
    # natural momentum -> amu*A/fs
    assert np.linalg.norm(p) / TIME_UNIT_CONVERSION < 1e-6


def test_nve_short_horizon_tight():
    """At dt = 1 fs, before any cutoff crossing, the symplectic integrator
    in f64 must conserve energy to ~1e-7 eV over 10 steps."""
    state, ff = argon_system(3, 3, 3)
    state = initialize_velocity(state, 60.0, seed=777)
    state = ff.compute(state)
    e0 = float(compute_thermo(state).kinetic_energy + jnp.sum(state.potential_energy))
    _, _, thermo = md_run(state, ff, NVE(), 1.0 / TIME_UNIT_CONVERSION, 10)
    etot = np.asarray(thermo.kinetic_energy + thermo.potential_energy)
    assert np.max(np.abs(etot - e0)) < 1e-6


def test_temperature_definition():
    state, ff = argon_system(2, 2, 2)
    state = initialize_velocity(state, 120.0, seed=1)
    t = float(compute_thermo(state).temperature)
    assert np.isclose(t, 120.0, rtol=1e-10)
