"""Verlet-skin neighbor cache: cached trajectory must match per-step rebuild."""

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.nve import NVE
from gpumd_tpu.integrate.run import MDRunner
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.units import TIME_UNIT_CONVERSION


def _system(skin):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(3) for j in range(3) for k in range(3)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    box = Box.orthogonal([3 * a0] * 3)
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    state = initialize_velocity(state, 120.0, seed=5)
    lj = LJ.from_params(1.032e-2, 3.405, 6.0)
    ff = ForceField.create([lj], box, n, mn=128, skin=skin)
    return state, ff


def test_cached_matches_rebuild_every_step():
    dt = 2.0 / TIME_UNIT_CONVERSION
    state0, ff0 = _system(skin=0.0)
    state1, ff1 = _system(skin=1.0)
    s0 = ff0.compute(state0)
    s1 = ff1.compute(state1)
    r0 = MDRunner(ff0, NVE(), dt, 100)
    r1 = MDRunner(ff1, NVE(), dt, 100)
    f0, _, th0 = r0(s0)
    f1, _, th1 = r1(s1)
    # identical trajectories (same forces every step); the cached path does
    # not wrap positions between rebuilds, so compare modulo the lattice.
    diff = np.asarray(f0.box.minimum_image(f0.position - f1.position))
    assert np.max(np.abs(diff)) < 1e-10
    assert np.allclose(
        np.asarray(f0.velocity), np.asarray(f1.velocity), atol=1e-10
    )
    assert np.allclose(
        np.asarray(th0.potential_energy),
        np.asarray(th1.potential_energy),
        atol=1e-10,
    )


def test_cache_shift_vectors_cross_boundary():
    """Atoms drifting across the periodic boundary must keep exact r12
    through the image-shift bookkeeping (positions are not wrapped between
    rebuilds)."""
    state, ff = _system(skin=2.0)
    state = ff.compute(state)
    cache = jax.jit(ff.refresh_cache)(state)
    # artificially translate everything near the boundary
    moved = state._replace(position=state.position + 0.4)
    out_cached, _ = jax.jit(ff.compute_cached)(moved, cache)
    out_fresh = ff.compute(moved)
    assert np.allclose(
        np.asarray(out_cached.force), np.asarray(out_fresh.force), atol=1e-9
    )
    assert np.allclose(
        np.asarray(out_cached.potential_energy),
        np.asarray(out_fresh.potential_energy),
        atol=1e-10,
    )
