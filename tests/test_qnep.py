"""qNEP (charge_mode 1): charges, Ewald electrostatics, BEC golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.io.xyz import read_xyz
from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
from gpumd_tpu.model.state import make_state
from gpumd_tpu.neighbor.neighbor import neighbor_brute
from gpumd_tpu.potentials.nep.charge import NEPCharge

from conftest import requires_reference

MODELS = "/root/reference/tests_pytest/fixtures/models"
STRUCTS = "/root/reference/tests_pytest/fixtures/structures"
GOLDEN = "/root/reference/tests_pytest/fixtures/golden"


@pytest.fixture(scope="module")
def batio3():
    nep = NEPCharge.from_file(f"{MODELS}/qnep_mode1_BaTiO3.txt")
    frame = read_xyz(f"{STRUCTS}/BaTiO3-nat40-rattled.xyz")
    types = np.array([nep.model.symbols.index(s) for s in frame.symbols])
    box = Box.from_lattice(frame.lattice, pbc=frame.pbc)
    state = make_state(frame.positions, frame.default_masses(), types, box)
    ff = ForceField.create([nep], box, frame.n_atoms, mn=512)
    return nep, frame, state, ff


@requires_reference
def test_charges_neutral_and_physical(batio3):
    nep, frame, state, ff = batio3
    nbr = ff.neighbor.build(state.position, state.box, state.mask)
    q = np.asarray(nep.charges(state, nbr))
    assert abs(q.sum()) < 1e-10
    # Oxygen negative, Ba/Ti positive in a perovskite
    sym = np.array(frame.symbols)
    assert q[sym == "O"].mean() < 0
    assert q[sym == "Ba"].mean() > 0


@requires_reference
def test_forces_match_fd(batio3):
    """FD validation covers every chain: ANN charge head, neutrality
    shift, real-space erfc, and reciprocal Ewald."""
    nep, frame, state, ff = batio3
    out = ff.compute(state)
    f = np.asarray(out.force)
    h = 1e-5
    for atom, comp in [(0, 0), (11, 1), (29, 2)]:
        pp = frame.positions.copy(); pp[atom, comp] += h
        pm = frame.positions.copy(); pm[atom, comp] -= h
        ep = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pp))).potential_energy))
        em = float(jnp.sum(ff.compute(state._replace(position=jnp.asarray(pm))).potential_energy))
        fd = -(ep - em) / (2 * h)
        assert np.isclose(f[atom, comp], fd, rtol=2e-4, atol=1e-6), (
            atom, comp, f[atom, comp], fd,
        )


@requires_reference
def test_bec_matches_golden(batio3):
    nep, frame, state, ff = batio3
    nbr = ff.neighbor.build(state.position, state.box, state.mask)
    bec = np.asarray(nep.born_effective_charges(state, nbr)).reshape(-1, 9)
    gold = np.load(f"{GOLDEN}/bec_bulk_perovskite_qnep_mode1_ewald.npz")["bec"]
    assert np.allclose(bec, gold, rtol=1e-4, atol=1e-4), np.abs(bec - gold).max()


@requires_reference
def test_rotation_invariance(batio3):
    nep, frame, state, ff = batio3
    out0 = ff.compute(state)
    axis = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    th = 0.5
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    box_r = Box.from_lattice(frame.lattice @ R.T, pbc=frame.pbc)
    state_r = state._replace(
        position=jnp.asarray(frame.positions @ R.T), box=box_r
    )
    ff_r = ForceField.create([nep], box_r, frame.n_atoms, mn=512)
    out1 = ff_r.compute(state_r)
    assert np.isclose(
        float(jnp.sum(out0.potential_energy)),
        float(jnp.sum(out1.potential_energy)),
        rtol=1e-8,
    )
    assert np.allclose(
        np.asarray(out0.force) @ R.T, np.asarray(out1.force), atol=1e-6
    )


@requires_reference
def test_water_qnep_runs():
    nep = NEPCharge.from_file(f"{MODELS}/qnep_mode1_water.txt")
    frame = read_xyz(f"{STRUCTS}/water-nat63-from-md.xyz")
    types = np.array([nep.model.symbols.index(s) for s in frame.symbols])
    box = Box.from_lattice(frame.lattice, pbc=frame.pbc)
    state = make_state(frame.positions, frame.default_masses(), types, box)
    ff = ForceField.create([nep], box, frame.n_atoms, mn=768)
    out = ff.compute(state)
    assert np.isfinite(float(jnp.sum(out.potential_energy)))
    assert np.isfinite(np.asarray(out.force)).all()


@requires_reference
def test_ewald_pppm_consistency(batio3):
    """PPPM mesh solve agrees with classical Ewald on energies and forces
    (mirror of tests_pytest/test_kspace_consistency.py; the mesh error at
    spacing ~1 A with order-5 splines is well under force tolerance)."""
    nep, frame, state, ff = batio3
    nbr = ff.neighbor.build(state.position, state.box, state.mask)
    out_e = nep._replace(kspace_method="ewald").compute_with_state(state, nbr)
    out_p = nep._replace(kspace_method="pppm").compute_with_state(state, nbr)
    e_ew = float(jnp.sum(out_e.energy * state.mask))
    e_pp = float(jnp.sum(out_p.energy * state.mask))
    n = int(jnp.sum(state.mask))
    assert abs(e_ew - e_pp) / n < 2e-4  # eV/atom
    f_e = np.asarray(out_e.force)
    f_p = np.asarray(out_p.force)
    assert np.max(np.abs(f_e - f_p)) < 5e-3  # eV/A
    w_e = np.asarray(jnp.sum(out_e.virial, axis=0))
    w_p = np.asarray(jnp.sum(out_p.virial, axis=0))
    assert np.max(np.abs(w_e - w_p)) < 5e-2  # eV total virial


@requires_reference
def test_pppm_energy_matches_ewald_point_charges():
    """Bare k-space backends agree for random neutral point charges."""
    from gpumd_tpu.potentials.nep.pppm import best_mesh, pppm_reciprocal_energy

    rng = np.random.default_rng(3)
    n = 24
    lbox = 11.0
    box = Box.orthogonal(np.array([lbox, lbox, lbox]))
    pos = jnp.asarray(rng.random((n, 3)) * lbox)
    q = rng.random(n) - 0.5
    q -= q.mean()
    q = jnp.asarray(q)

    nep = NEPCharge.from_file(f"{MODELS}/qnep_mode1_BaTiO3.txt")
    kv, gk = nep.kvectors(box)
    e_ew = float(nep.reciprocal_energy(q, pos, jnp.asarray(kv), jnp.asarray(gk)))
    alpha = nep._alpha()
    mesh = best_mesh(box)
    e_pp = float(pppm_reciprocal_energy(q, pos, box, alpha, mesh))
    assert abs(e_ew - e_pp) < 2e-3 * max(abs(e_ew), 1.0), (e_ew, e_pp)


@requires_reference
def test_compute_dpdt_and_es_app(tmp_path):
    """compute_dpdt (BEC . v) and compute_es (electrostatic split) run
    through the app on a qNEP model (ref: compute_dpdt.cu, compute_es.cu)."""
    import shutil

    shutil.copy(f"{MODELS}/qnep_mode1_BaTiO3.txt", tmp_path / "nep.txt")
    shutil.copy(f"{STRUCTS}/BaTiO3-nat40-rattled.xyz", tmp_path / "model.xyz")
    (tmp_path / "run.in").write_text(
        """potential nep.txt
velocity 300
time_step 1
ensemble nve
compute_dpdt 5
compute_es 10
run 20
"""
    )
    from gpumd_tpu.app.gpumd import Session

    s = Session(str(tmp_path), quiet=True)
    s.execute()
    dp = np.loadtxt(tmp_path / "dpdt.out")
    assert dp.shape == (4, 7)
    assert np.isfinite(dp).all()
    # integrated polarization accumulates
    assert not np.allclose(dp[-1, 4:], 0.0)
    ee = np.loadtxt(tmp_path / "elactrostatic_energy.out")
    assert ee.shape == (2,)
    ef = np.loadtxt(tmp_path / "elactrostatic_force.out")
    assert ef.shape == (2 * 40, 3)
    assert np.isfinite(ef).all()


def test_compute_ic(tmp_path):
    """Nernst-Einstein ionic conductivity columns (ref: iron_conductivity.cu)."""
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    rng = np.random.default_rng(0)
    a0, nc_ = 5.26, 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc_) for j in range(nc_) for k in range(nc_)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc_ * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 60
time_step 5
ensemble nve
compute_ic 5 10 0 1.0
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    ic = np.loadtxt(tmp_path / "ic.out")
    assert ic.shape == (10, 4)
    assert np.isfinite(ic).all()
    # some diffusion signal at warm T
    assert np.abs(ic[1:, 1:]).max() > 0


@requires_reference
def test_charge_mode2_runs():
    """charge_mode 2 (k-space-only electrostatics) evaluates and passes
    the force FD check (ref: nep_charge.cu:128-141, 1429)."""
    nep = NEPCharge.from_file(f"{MODELS}/qnep_mode2_BaTiO3.txt")
    assert nep.charge_mode == 2
    frame = read_xyz(f"{STRUCTS}/BaTiO3-nat40-rattled.xyz")
    types = np.array([nep.model.symbols.index(s) for s in frame.symbols])
    box = Box.from_lattice(frame.lattice, pbc=frame.pbc)
    state = make_state(frame.positions, frame.default_masses(), types, box)
    ff = ForceField.create([nep], box, frame.n_atoms, mn=512)
    nbr = ff.neighbor.build(state.position, state.box, state.mask)
    out = nep.compute_with_state(state, nbr)
    assert np.isfinite(np.asarray(out.force)).all()
    e0 = float(jnp.sum(out.energy * state.mask))
    assert np.isfinite(e0)
    # FD check on one coordinate
    h = 1e-3

    def e_of(pos):
        st = state._replace(position=pos)
        nb = ff.neighbor.build(pos, st.box, st.mask)
        o = nep.compute_with_state(st, nb)
        return float(jnp.sum(o.energy * st.mask))

    ep = e_of(state.position.at[3, 1].add(h))
    em = e_of(state.position.at[3, 1].add(-h))
    f_fd = -(ep - em) / (2 * h)
    assert np.isclose(float(out.force[3, 1]), f_fd, rtol=5e-3, atol=1e-4)


def test_charge_params_vector_roundtrip():
    """params_from_vector with charge_mode reproduces NEPCharge.from_file's
    parameter parse (same flat layout, ref: nep_charge.cu:236-253)."""
    import dataclasses

    from gpumd_tpu.potentials.nep.charge import NEPCharge
    from gpumd_tpu.potentials.nep.params import (
        num_trainable,
        params_from_vector,
    )

    pot = NEPCharge.from_file(
        "/root/reference/tests_pytest/fixtures/models/qnep_mode1_BaTiO3.txt"
    )
    model = dataclasses.replace(pot.model, charge_mode=pot.charge_mode)
    t, neu, dim = model.num_types, model.neurons, model.dim
    # rebuild the flat theta in file order
    blocks = []
    for ty in range(t):
        blocks += [
            np.asarray(pot.params.w0[ty]).ravel(),
            np.asarray(pot.params.b0[ty]),
            np.asarray(pot.params.w1[ty]),
            np.asarray(pot.w1_charge[ty]),
        ]
    blocks += [
        np.asarray(pot.sqrt_epsilon_inf).reshape(1),
        np.asarray(pot.params.b1).reshape(1),
    ]
    nr = (model.n_max_radial + 1) * (model.basis_size_radial + 1)
    na = (model.n_max_angular + 1) * (model.basis_size_angular + 1)
    c_rad = np.asarray(pot.params.c_radial).reshape(t * t, nr).T.ravel()
    c_ang = np.asarray(pot.params.c_angular).reshape(t * t, na).T.ravel()
    blocks += [c_rad, c_ang]
    theta = np.concatenate(blocks)
    assert theta.size == num_trainable(model), (
        theta.size, num_trainable(model)
    )
    p2 = params_from_vector(
        model, jnp.asarray(theta), jnp.asarray(pot.params.q_scaler)
    )
    np.testing.assert_allclose(np.asarray(p2.w0), np.asarray(pot.params.w0))
    np.testing.assert_allclose(np.asarray(p2.w1), np.asarray(pot.params.w1))
    np.testing.assert_allclose(
        np.asarray(p2.w1_charge), np.asarray(pot.w1_charge)
    )
    np.testing.assert_allclose(
        float(p2.sqrt_epsilon_inf), float(pot.sqrt_epsilon_inf)
    )
    np.testing.assert_allclose(
        np.asarray(p2.c_radial), np.asarray(pot.params.c_radial)
    )
    np.testing.assert_allclose(
        np.asarray(p2.c_angular), np.asarray(pot.params.c_angular)
    )


def test_qnep_training_smoke(tmp_path):
    """qNEP SNES training: losses (incl. lambda_q/lambda_z charge and BEC
    terms) are finite and decrease on a tiny synthetic rock-salt set."""
    from gpumd_tpu.io.nep_input import NepTrainConfig, model_from_config
    from gpumd_tpu.io.xyz import XYZFrame
    from gpumd_tpu.train.dataset import batch_structures
    from gpumd_tpu.train.snes import SNESTrainer

    rng = np.random.default_rng(3)
    frames = []
    a0 = 4.0
    for _ in range(4):
        # 2x1x1 rock salt + jitter
        base = np.array(
            [[0, 0, 0], [0.5, 0.5, 0.5], [1.0, 0, 0], [1.5, 0.5, 0.5]]
        ) * a0
        pos = base + rng.normal(0, 0.05, base.shape)
        n = len(pos)
        bec = np.tile(np.eye(3).ravel(), (n, 1)) * np.where(
            np.arange(n) % 2 == 0, 1.0, -1.0
        )[:, None]
        f = XYZFrame(
            symbols=["Na", "Cl"] * 2, positions=pos,
            lattice=np.diag([2 * a0, a0, a0]), pbc=(True, True, True),
            forces=rng.normal(0, 0.1, (n, 3)),
            info={"energy": f"{rng.normal(-3, 0.1) * n}", "charge": "0"},
        )
        f.arrays["bec"] = bec
        frames.append(f)

    cfg = NepTrainConfig(
        num_types=2, symbols=("Na", "Cl"), rc_radial=6.0, rc_angular=4.0,
        n_max_radial=2, n_max_angular=2, basis_size_radial=2,
        basis_size_angular=2, l_max=4, l_max_4body=0, neurons=4,
        charge_mode=1, population_size=12, maximum_generation=8,
        output_interval=2, batch_size=10,
    )
    model = model_from_config(cfg)
    batch = batch_structures(
        frames, cfg.symbols, rc=cfg.rc_radial, mn=40, charge_mode=1
    )
    assert batch.kvec is not None and batch.kvec.shape[0] == 4
    assert float(batch.gk.max()) > 0.0
    trainer = SNESTrainer(model, cfg, [batch], workdir=str(tmp_path))
    trainer.train(log=lambda *a, **k: None)
    rows = np.loadtxt(tmp_path / "loss.out")
    assert rows.shape[1] == 14  # ref qNEP 14-col format (fitness.cu:525)
    assert np.isfinite(rows).all()
    assert rows[-1, 7] >= 0.0 and rows[-1, 8] > 0.0
    # nep.txt round-trips through the charge loader
    from gpumd_tpu.potentials.nep.charge import NEPCharge

    pot = NEPCharge.from_file(str(tmp_path / "nep.txt"))
    assert pot.charge_mode == 1
    assert pot.w1_charge.shape == (2, 4)
