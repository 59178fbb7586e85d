"""Sharded-vs-unsharded equivalence on a virtual 8-device CPU mesh —
the test the reference never had (SURVEY.md section 4: multi-GPU untested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.parallel.domain import ShardedMD, make_mesh, sort_by_slab
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.potentials.nep import NEP

from conftest import requires_reference


def lj_system(rng, n=128, lengths=(22.0, 22.0, 22.0)):
    pos = rng.uniform(0, 1, (n, 3)) * np.array(lengths)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    return state, box


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_lj_matches_unsharded(rng):
    state, box = lj_system(rng, n=128)
    lj = LJ.from_params(1.032e-2, 3.405, 8.0)
    ff = ForceField.create([lj], box, 128, mn=128)
    ref = ff.compute(state)

    mesh = make_mesh(8)
    smd = ShardedMD.create([lj], box, 128, mesh, mn=128)
    sstate = smd.shard_state(state)
    out = smd.compute_forces(sstate)

    assert np.allclose(
        np.asarray(out.potential_energy), np.asarray(ref.potential_energy), atol=1e-12
    )
    assert np.allclose(np.asarray(out.force), np.asarray(ref.force), atol=1e-12)
    assert np.allclose(np.asarray(out.virial), np.asarray(ref.virial), atol=1e-12)


@pytest.mark.slow
def test_sharded_with_padding_and_slab_sort(rng):
    n, n_pad = 100, 128
    pos = rng.uniform(0, 1, (n, 3)) * 22.0
    box = Box.orthogonal([22.0, 22.0, 22.0])
    order = sort_by_slab(jnp.asarray(pos), box)
    pos = pos[order]
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box, n_pad=n_pad)
    lj = LJ.from_params(1.032e-2, 3.405, 8.0)
    ff = ForceField.create([lj], box, n, mn=128)
    ref = ff.compute(state)

    mesh = make_mesh(8)
    smd = ShardedMD.create([lj], box, n, mesh, mn=128)
    out = smd.compute_forces(smd.shard_state(state))
    assert np.allclose(np.asarray(out.force), np.asarray(ref.force), atol=1e-12)
    assert np.allclose(np.asarray(out.force)[n:], 0.0)


@requires_reference
@pytest.mark.slow
def test_sharded_nep_matches_unsharded():
    from gpumd_tpu.io.xyz import read_xyz

    nep = NEP.from_file(
        "/root/reference/tests_pytest/fixtures/models/nep_BaZrO3.txt"
    )
    f = read_xyz(
        "/root/reference/tests_pytest/fixtures/structures/BaZrO3-nat40-rattled.xyz"
    )
    types = np.array([nep.model.symbols.index(s) for s in f.symbols])
    box = Box.from_lattice(f.lattice, pbc=f.pbc)
    state = make_state(f.positions, f.default_masses(), types, box)
    ff = ForceField.create([nep], box, f.n_atoms, mn=256)
    ref = ff.compute(state)

    mesh = make_mesh(8)
    smd = ShardedMD.create([nep], box, f.n_atoms, mesh, mn=256)
    out = smd.compute_forces(smd.shard_state(state))
    assert np.allclose(
        np.asarray(out.potential_energy), np.asarray(ref.potential_energy), atol=1e-10
    )
    assert np.allclose(np.asarray(out.force), np.asarray(ref.force), atol=1e-10)


@pytest.mark.slow
def test_sharded_cell_list_matches_unsharded(rng):
    """Cell-list halo build (method="cell", the production path at scale:
    n > 2048 and a thick box) vs the single-chip list path."""
    n = 4096
    lengths = (48.0, 48.0, 48.0)
    pos = rng.uniform(0, 1, (n, 3)) * np.array(lengths)
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    lj = LJ.from_params(1.032e-2, 3.405, 8.0)
    ff = ForceField.create([lj], box, n, mn=128)
    ref = ff.compute(state)

    mesh = make_mesh(8)
    smd = ShardedMD.create([lj], box, n, mesh, mn=128)
    assert smd.neighbor.method == "cell"  # this test must cover the cell path
    out = smd.compute_forces(smd.shard_state(state))
    assert np.allclose(
        np.asarray(out.potential_energy), np.asarray(ref.potential_energy),
        atol=1e-11,
    )
    assert np.allclose(np.asarray(out.force), np.asarray(ref.force), atol=1e-11)
    assert np.allclose(np.asarray(out.virial), np.asarray(ref.virial), atol=1e-11)
