"""NEP inference correctness: golden regression against the reference's
frozen fixtures, invariances, and force-energy consistency.

(mirrors tests_pytest/test_regression.py, test_invariances.py,
test_force_energy_consistency.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.io.xyz import read_xyz
from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
from gpumd_tpu.neighbor.neighbor import neighbor_brute
from gpumd_tpu.potentials.nep import NEP

from conftest import requires_reference

MODELS = "/root/reference/tests_pytest/fixtures/models"
STRUCTURES = "/root/reference/tests_pytest/fixtures/structures"
GOLDEN = "/root/reference/tests_pytest/fixtures/golden"


def evaluate(nep: NEP, frame, positions=None, mn=1200):
    types = jnp.asarray([nep.model.symbols.index(s) for s in frame.symbols])
    box = Box.from_lattice(frame.lattice, pbc=frame.pbc)
    pos = jnp.asarray(positions if positions is not None else frame.positions)
    mask = jnp.ones(frame.n_atoms)
    reps = num_replicas_for_cutoff(box, nep.rc)
    nbr = neighbor_brute(pos, box, mask, rc=nep.rc, mn=mn, reps=reps)
    assert not bool(nbr.overflowed())
    out = nep.compute(types, nbr, mask)
    return out, box


@pytest.fixture(scope="module")
def bazro3():
    nep = NEP.from_file(f"{MODELS}/nep_BaZrO3.txt")
    frame = read_xyz(f"{STRUCTURES}/BaZrO3-nat40-rattled.xyz")
    return nep, frame


@requires_reference
def test_golden_bazro3_energy_forces_stress(bazro3):
    nep, frame = bazro3
    out, box = evaluate(nep, frame)
    gold = np.load(f"{GOLDEN}/bulk_bazro3.npz")
    # reference tolerances (tests_pytest/conftest.py:37-52); golden arrays
    # carry the reference's own fp32 rounding.
    assert np.isclose(float(jnp.sum(out.energy)), float(gold["energy"]),
                      rtol=1e-6, atol=2e-5 * frame.n_atoms)
    assert np.allclose(np.asarray(out.force), gold["forces"], rtol=1e-4, atol=1e-4)
    w = np.asarray(jnp.sum(out.virial, axis=0))
    stress = -np.array(
        [w[0, 0], w[1, 1], w[2, 2], w[1, 2], w[0, 2], w[0, 1]]
    ) / float(box.volume)
    assert np.allclose(stress, gold["stress"], rtol=1e-4, atol=1e-6)


@requires_reference
@pytest.mark.parametrize(
    "model,structure",
    [
        ("nep_BaZrO3.txt", "BaZrO3-nat40-rattled.xyz"),
        ("nep_C.txt", "C-nat16-rattled.xyz"),
        ("nep_water.txt", "water-nat63-from-md.xyz"),
    ],
)
def test_forces_match_autodiff_fd(model, structure):
    """Central finite differences of the total energy vs computed forces."""
    nep = NEP.from_file(f"{MODELS}/{model}")
    frame = read_xyz(f"{STRUCTURES}/{structure}")
    out, _ = evaluate(nep, frame)
    f = np.asarray(out.force)
    h = 1e-4
    rng = np.random.default_rng(0)
    atoms = rng.choice(frame.n_atoms, size=3, replace=False)
    for atom in atoms:
        for comp in range(3):
            pp = frame.positions.copy()
            pp[atom, comp] += h
            pm = frame.positions.copy()
            pm[atom, comp] -= h
            ep, _ = evaluate(nep, frame, positions=pp)
            em, _ = evaluate(nep, frame, positions=pm)
            fd = -(float(jnp.sum(ep.energy)) - float(jnp.sum(em.energy))) / (2 * h)
            assert np.isclose(f[atom, comp], fd, rtol=5e-5, atol=1e-7), (
                model, atom, comp, f[atom, comp], fd,
            )


@requires_reference
def test_rotation_invariance(bazro3):
    nep, frame = bazro3
    out0, _ = evaluate(nep, frame)
    # Rodrigues rotation about an arbitrary axis
    axis = np.array([1.0, 2.0, 3.0])
    axis /= np.linalg.norm(axis)
    th = 0.7
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K

    import dataclasses

    rot_frame = dataclasses.replace(
        frame,
        positions=frame.positions @ R.T,
        lattice=frame.lattice @ R.T,
    )
    out1, _ = evaluate(nep, rot_frame)
    assert np.allclose(
        np.asarray(out0.energy), np.asarray(out1.energy), atol=1e-9
    )
    # forces rotate with the frame
    assert np.allclose(
        np.asarray(out0.force) @ R.T, np.asarray(out1.force), atol=1e-8
    )


@requires_reference
def test_permutation_invariance(bazro3):
    nep, frame = bazro3
    out0, _ = evaluate(nep, frame)
    perm = np.random.default_rng(1).permutation(frame.n_atoms)
    import dataclasses

    pframe = dataclasses.replace(
        frame,
        positions=frame.positions[perm],
        symbols=[frame.symbols[i] for i in perm],
    )
    out1, _ = evaluate(nep, pframe)
    assert np.allclose(
        np.asarray(out0.energy)[perm], np.asarray(out1.energy), atol=1e-10
    )
    assert np.allclose(
        np.asarray(out0.force)[perm], np.asarray(out1.force), atol=1e-9
    )


@requires_reference
def test_pbc_wrap_self_consistency(bazro3):
    nep, frame = bazro3
    out0, box = evaluate(nep, frame)
    # translate some atoms by full lattice vectors
    shift = np.zeros_like(frame.positions)
    shift[::3] += frame.lattice[0]
    shift[1::3] -= frame.lattice[2]
    out1, _ = evaluate(nep, frame, positions=frame.positions + shift)
    assert np.allclose(
        np.asarray(out0.energy), np.asarray(out1.energy), atol=1e-9
    )
    assert np.allclose(np.asarray(out0.force), np.asarray(out1.force), atol=1e-8)


@requires_reference
def test_zbl_model_loads_and_runs():
    """nep_BaTiO3 has universal ZBL enabled."""
    nep = NEP.from_file(f"{MODELS}/nep_BaTiO3.txt")
    if not nep.model.zbl:
        pytest.skip("fixture lost its zbl flag?")
    frame = read_xyz(f"{STRUCTURES}/BaTiO3-nat40-rattled.xyz")
    out, _ = evaluate(nep, frame)
    assert np.isfinite(float(jnp.sum(out.energy)))
    # ZBL contributes a repulsive (positive) energy at short range; check
    # forces still integrate: FD on one coordinate
    f = np.asarray(out.force)
    h = 1e-4
    pp = frame.positions.copy(); pp[5, 1] += h
    pm = frame.positions.copy(); pm[5, 1] -= h
    ep, _ = evaluate(nep, frame, positions=pp)
    em, _ = evaluate(nep, frame, positions=pm)
    fd = -(float(jnp.sum(ep.energy)) - float(jnp.sum(em.energy))) / (2 * h)
    assert np.isclose(f[5, 1], fd, rtol=5e-5, atol=1e-7)


def test_tables_match_reference_constants():
    """The generated SH tables must reproduce the hard-coded reference
    values (nep_utilities.cuh C3B / Z_COEFFICIENT)."""
    from gpumd_tpu.potentials.nep import tables

    c = tables.c3b_flat()
    assert len(c) == 80
    ref_head = [
        0.238732414637843, 0.119366207318922, 0.119366207318922,
        0.099471839432435, 0.596831036594608, 0.596831036594608,
        0.149207759148652, 0.149207759148652,
    ]
    assert np.allclose(c[:8], ref_head, rtol=1e-12)
    ref_tail = [4.250672607309055, 4.250672607309055,
                0.265667037956816, 0.265667037956816]
    assert np.allclose(c[-4:], ref_tail, rtol=1e-12)
    assert np.allclose(
        tables.z_coefficient_table(6)[0], [-5, 0, 105, 0, -315, 0, 231]
    )
    assert np.allclose(tables.z_coefficient_table(3)[1], [-1, 0, 5, 0])
