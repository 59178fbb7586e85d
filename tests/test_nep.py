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
@pytest.mark.slow
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


# ---- NEP3 (legacy shared-ANN format) ----------------------------------------

NEP3_DIR = "/root/reference/tests/gpumd/dump_observer/carbon_average"


@requires_reference
@pytest.mark.parametrize(
    "pot,obs", [("C_2022_NEP3.txt", "reference_observer0.xyz"),
                ("C_2022_NEP3_MODIFIED.txt", "reference_observer1.xyz")]
)
@pytest.mark.slow
def test_nep3_golden_observer_frames(pot, obs):
    """nep3 files (one shared ANN across types, ref: legacy num_para_ann)
    reproduce the reference's checked-in observer goldens: each frame of
    reference_observer*.xyz carries positions + the per-potential energy
    and forces evaluated on them (tests/gpumd/dump_observer)."""
    from gpumd_tpu.io.xyz import read_xyz_frames

    nep = NEP.from_file(f"{NEP3_DIR}/{pot}")
    assert nep.model.version == 3
    frames = read_xyz_frames(f"{NEP3_DIR}/{obs}")
    frame = frames[0]
    out, _ = evaluate(nep, frame, mn=2000)
    e_tot = float(jnp.sum(out.energy))
    e_ref = float(frame.info["energy"])
    assert np.isclose(e_tot, e_ref, rtol=1e-6, atol=2e-4)
    assert np.allclose(np.asarray(out.force), frame.forces, rtol=1e-4,
                       atol=2e-4)


def _rotate(pos, axis, angle):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    k = np.array([
        [0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]
    ])
    r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
    return pos @ r.T, r


@pytest.mark.slow
def test_extended_invariants_rotation_invariance(rng):
    """q112/q123/q233/q134 invariants (ref: find_q nep_utilities.cuh:
    1578-1700) must be exactly rotation-invariant — a sign error in any
    term breaks this."""
    from gpumd_tpu.potentials.nep.params import NepModel, random_params

    model = NepModel(
        version=4, model_type=0, num_types=1, symbols=("C",),
        atomic_numbers=(6,), rc_radial=(6.0,), rc_angular=(4.0,),
        mn_radial=64, mn_angular=32, n_max_radial=4, n_max_angular=4,
        basis_size_radial=4, basis_size_angular=4, l_max=4,
        has_q=(1, 1, 1, 1, 1, 1), neurons=10,
    )
    nep = NEP(model=model, params=random_params(model, seed=3,
                                                 dtype=jnp.float64))
    n = 20
    pos = rng.uniform(0, 10, (n, 3))
    box = Box.orthogonal([60.0, 60.0, 60.0], pbc=(False, False, False))
    types = jnp.zeros(n, jnp.int32)
    mask = jnp.ones(n)

    def energies(p):
        nbr = neighbor_brute(jnp.asarray(p), box, mask, rc=6.0, mn=32)
        return nep.compute(types, nbr, mask).energy

    e0 = np.asarray(energies(pos))
    pos_r, _ = _rotate(pos, [1.0, -2.0, 0.7], 1.1)
    e1 = np.asarray(energies(pos_r))
    np.testing.assert_allclose(e1, e0, rtol=1e-10, atol=1e-12)
    # and permutation invariance
    perm = rng.permutation(n)
    e2 = np.asarray(energies(pos[perm]))
    np.testing.assert_allclose(e2, e0[perm], rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_temperature_mode(rng):
    """model_type 3: target temperature enters as the last descriptor
    (ref: nep.cu:1483); energies respond to it."""
    from gpumd_tpu.potentials.nep.params import NepModel, random_params

    model = NepModel(
        version=4, model_type=3, num_types=1, symbols=("W",),
        atomic_numbers=(74,), rc_radial=(5.0,), rc_angular=(4.0,),
        mn_radial=64, mn_angular=32, n_max_radial=4, n_max_angular=4,
        basis_size_radial=4, basis_size_angular=4, l_max=4,
        neurons=10,
    )
    assert model.dim == (4 + 1) + (4 + 1) * 4 + 1
    params = random_params(model, seed=2, dtype=jnp.float64)
    # realistic temperature scaling (trained models carry ~1/T_max in the
    # last q_scaler slot; a raw 300 K would saturate the tanh layer)
    params = params._replace(
        q_scaler=params.q_scaler.at[-1].set(1e-3)
    )
    nep = NEP(model=model, params=params)
    n = 16
    pos = rng.uniform(0, 8, (n, 3))
    box = Box.orthogonal([40.0, 40.0, 40.0], pbc=(False, False, False))
    types = jnp.zeros(n, jnp.int32)
    mask = jnp.ones(n)
    nbr = neighbor_brute(jnp.asarray(pos), box, mask, rc=5.0, mn=32)

    with pytest.raises(ValueError):
        nep.compute(types, nbr, mask)
    e300 = nep._replace(temperature=300.0).compute(types, nbr, mask).energy
    e900 = nep._replace(temperature=900.0).compute(types, nbr, mask).energy
    assert not np.allclose(np.asarray(e300), np.asarray(e900))
    # forces still exactly -dE/dx at fixed T (finite difference, one atom)
    nep_t = nep._replace(temperature=300.0)
    out = nep_t.compute(types, nbr, mask)
    h = 1e-6
    for k in range(3):
        pp = np.array(pos); pp[3, k] += h
        pm = np.array(pos); pm[3, k] -= h
        ep = jnp.sum(nep_t.compute(
            types, neighbor_brute(jnp.asarray(pp), box, mask, rc=5.0, mn=32),
            mask).energy)
        em = jnp.sum(nep_t.compute(
            types, neighbor_brute(jnp.asarray(pm), box, mask, rc=5.0, mn=32),
            mask).energy)
        fd = -(float(ep) - float(em)) / (2 * h)
        assert np.isclose(fd, float(out.force[3, k]), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_restrict_foundation_model(rng):
    """nep89-style foundation model: NEP.restrict slices the type tables to
    the species present in a simulation with IDENTICAL numerics, keeping
    the T^2-unrolled fast engines open (ref: nep.cu:100-395 instead carries
    the full 89-type table into the kernel)."""
    import string

    from gpumd_tpu.potentials.nep.params import NepModel, random_params

    t_full = 89
    syms = tuple(
        f"{a}{b}" for a in string.ascii_uppercase
        for b in string.ascii_lowercase
    )[:t_full]
    model = NepModel(
        version=4, model_type=0, num_types=t_full, symbols=syms,
        atomic_numbers=tuple(range(1, t_full + 1)),
        rc_radial=(5.0,) * t_full, rc_angular=(3.5,) * t_full,
        mn_radial=64, mn_angular=24, n_max_radial=4, n_max_angular=3,
        basis_size_radial=4, basis_size_angular=3, l_max=4,
        neurons=8, zbl=True, zbl_rc_inner=0.5, zbl_rc_outer=1.5,
    )
    nep = NEP(model=model, params=random_params(model, seed=5))

    # a 3-species system drawn from the middle of the table
    present = [syms[10], syms[40], syms[70]]
    n = 24
    pos = rng.uniform(0, 9.0, (n, 3))
    box = Box.orthogonal([9.0, 9.0, 9.0])
    types_full = jnp.asarray(rng.integers(0, 3, n) * 30 + 10, jnp.int32)
    mask = jnp.ones(n)
    reps = num_replicas_for_cutoff(box, 5.0)
    nbr = neighbor_brute(jnp.asarray(pos), box, mask, rc=5.0, mn=64,
                         reps=reps)
    out_full = nep.compute(types_full, nbr, mask)

    small = nep.restrict(present)
    assert small.model.num_types == 3
    types_small = jnp.asarray(
        small.remap_types(np.asarray(types_full), model.symbols))
    out_small = small.compute(types_small, nbr, mask)

    np.testing.assert_allclose(
        np.asarray(out_small.energy), np.asarray(out_full.energy),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out_small.force), np.asarray(out_full.force),
        rtol=1e-10, atol=1e-12)

    # and the restricted model qualifies for the compact fast engine
    from gpumd_tpu.engine.nep_compact import CompactSpec

    CompactSpec.from_model(small.model, small.params)
