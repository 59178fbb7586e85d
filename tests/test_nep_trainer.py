"""NEP trainer end-to-end: nep.in + train.xyz -> SNES -> nep.txt."""

import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import requires_reference

TRAIN_XYZ = "/root/reference/examples/nep_train/train.xyz"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("neptrain")
    from gpumd_tpu.io.xyz import read_xyz_frames, write_xyz

    frames = read_xyz_frames(TRAIN_XYZ, max_frames=8)
    # rewrite a small train.xyz (pass through original info lines)
    import shutil

    with open(TRAIN_XYZ) as f:
        lines = f.readlines()
    out = []
    i = 0
    for _ in range(8):
        n = int(lines[i].split()[0])
        out += lines[i : i + 2 + n]
        i += 2 + n
    (d / "train.xyz").write_text("".join(out))
    (d / "nep.in").write_text(
        """type 2 Te Pb
version 4
cutoff 6 4
n_max 4 4
basis_size 4 4
l_max 4 2 0
neuron 10
population 12
generation 30
batch 8
output_interval 10
"""
    )
    return str(d)


@requires_reference
def test_parse_and_batch(workdir):
    from gpumd_tpu.io.nep_input import model_from_config, parse_nep_in
    from gpumd_tpu.io.xyz import read_xyz_frames
    from gpumd_tpu.train.dataset import batch_structures

    cfg = parse_nep_in(os.path.join(workdir, "nep.in"))
    assert cfg.symbols == ("Te", "Pb")
    model = model_from_config(cfg)
    assert model.dim == 5 + (4 + 1) * 5
    frames = read_xyz_frames(os.path.join(workdir, "train.xyz"))
    assert len(frames) == 8
    assert frames[0].forces is not None
    assert "energy" in frames[0].info
    batch = batch_structures(frames, cfg.symbols, rc=6.0, mn=200)
    assert batch.num_configs == 8
    assert float(batch.energy_ref[0]) != 0.0


@requires_reference
@pytest.mark.slow
def test_snes_training_reduces_loss(workdir):
    from gpumd_tpu.app.nep import main

    main([workdir])
    loss = np.loadtxt(os.path.join(workdir, "loss.out"))
    assert loss.shape[1] == 10  # ref 10-col format, test cols zero
    # fitness decreased over training
    assert loss[-1, 1] < loss[0, 1]
    # RMSE energy decreased
    assert loss[-1, 4] < loss[0, 4]
    assert os.path.exists(os.path.join(workdir, "nep.txt"))
    assert os.path.exists(os.path.join(workdir, "nep.restart"))


@requires_reference
@pytest.mark.slow  # consumes the nep.txt produced by the slow training test
def test_trained_nep_txt_loads_in_md(workdir):
    """The trainer's nep.txt must round-trip through the MD-side loader and
    produce the same energies as the trainer-side evaluation."""
    from gpumd_tpu.io.xyz import read_xyz_frames
    from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
    from gpumd_tpu.neighbor.neighbor import neighbor_brute
    from gpumd_tpu.potentials.nep import NEP
    from gpumd_tpu.train.dataset import batch_structures
    from gpumd_tpu.train.nep_train import batched_forward

    nep = NEP.from_file(os.path.join(workdir, "nep.txt"))
    frames = read_xyz_frames(os.path.join(workdir, "train.xyz"), max_frames=2)
    batch = batch_structures(frames, nep.model.symbols, rc=nep.rc, mn=200)
    out = batched_forward(nep.model, nep.params, batch)

    f = frames[0]
    types = jnp.asarray([nep.model.symbols.index(s) for s in f.symbols])
    box = Box.from_lattice(f.lattice, pbc=f.pbc)
    reps = num_replicas_for_cutoff(box, nep.rc)
    nbr = neighbor_brute(
        jnp.asarray(f.positions), box, jnp.ones(f.n_atoms),
        rc=nep.rc, mn=256, reps=reps,
    )
    md_out = nep.compute(types, nbr, jnp.ones(f.n_atoms))
    e_md = float(jnp.sum(md_out.energy))
    e_train = float(out.energy[0])
    assert np.isclose(e_md, e_train, rtol=1e-4, atol=1e-3), (e_md, e_train)


@requires_reference
@pytest.mark.slow  # consumes loss.out/nep.txt from the slow training test
def test_prediction_mode(workdir):
    from gpumd_tpu.app.nep import main

    (np.loadtxt(os.path.join(workdir, "loss.out")))  # training ran
    with open(os.path.join(workdir, "nep.in"), "a") as f:
        f.write("prediction 1\n")
    main([workdir])
    e = np.loadtxt(os.path.join(workdir, "energy_train.out"))
    assert e.shape == (8, 2)
    fr = np.loadtxt(os.path.join(workdir, "force_train.out"))
    assert fr.shape[1] == 6


def test_type_of_variable_vector():
    """Variable classes mirror the params_from_vector layout
    (ref: snes.cu:252-293)."""
    from gpumd_tpu.io.nep_input import NepTrainConfig, model_from_config
    from gpumd_tpu.potentials.nep.params import num_trainable
    from gpumd_tpu.train.snes import type_of_variable_vector

    cfg = NepTrainConfig(
        num_types=2, symbols=("Te", "Pb"), n_max_radial=4, n_max_angular=4,
        basis_size_radial=4, basis_size_angular=4, l_max=4, l_max_4body=2,
        l_max_5body=0, neurons=10,
    )
    model = model_from_config(cfg)
    tov = type_of_variable_vector(model)
    assert tov.shape == (num_trainable(model),)
    per_type = (model.dim + 2) * model.neurons
    # ANN blocks
    assert (tov[:per_type] == 0).all()
    assert (tov[per_type : 2 * per_type] == 1).all()
    # global bias is shared (class T)
    assert tov[2 * per_type] == 2
    # c-array rows: type-pair minor, owner = t1
    tail = tov[2 * per_type + 1 :]
    assert tail.shape[0] == 2 * 2 * (5 * 5 + 5 * 5)
    assert list(tail[:4]) == [0, 0, 1, 1]


def test_per_type_rmse_pooling():
    """Per-type RMSEs pool only configs containing that element
    (ref: dataset.cu:630-678)."""
    import jax
    from gpumd_tpu.io.nep_input import NepTrainConfig
    from gpumd_tpu.potentials.nep.params import NepModel
    from gpumd_tpu.train.nep_train import ConfigOutput
    from gpumd_tpu.train.snes import per_type_rmses

    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("A", "B"),
        atomic_numbers=(1, 2), rc_radial=(6.0, 6.0), rc_angular=(4.0, 4.0),
        mn_radial=8, mn_angular=8, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=4,
    )
    cfg = NepTrainConfig(num_types=2, symbols=("A", "B"))

    class FakeBatch:
        # config 0: pure type-0 (2 atoms); config 1: mixed (1+1)
        type = jnp.asarray([[0, 0], [0, 1]])
        mask = jnp.ones((2, 2))
        n_atoms = jnp.asarray([2, 2])
        num_configs = 2
        energy_ref = jnp.asarray([0.0, 0.0])
        force_ref = jnp.zeros((2, 2, 3))
        virial_ref = jnp.zeros((2, 6))
        has_virial = jnp.asarray([1.0, 1.0])
        weight = jnp.ones(2)
        energy_weight = jnp.ones(2)

    out = ConfigOutput(
        energy=jnp.asarray([2.0, 4.0]),  # per-atom de: 1.0 and 2.0
        force=jnp.zeros((2, 2, 3)),
        virial=jnp.zeros((2, 6)),
    )
    e, f, v, _, _ = per_type_rmses(model, cfg, out, FakeBatch())
    # type 0 pools both configs; type 1 only config 1; global both
    assert np.isclose(float(e[0]), np.sqrt((1.0 + 4.0) / 2))
    assert np.isclose(float(e[1]), 2.0)
    assert np.isclose(float(e[2]), np.sqrt((1.0 + 4.0) / 2))


def test_fine_tune_init(tmp_path):
    """Foundation-model bootstrap slices the right ANN blocks and c rows
    (ref: snes.cu:144-238, parameters.cu:263-281)."""
    from gpumd_tpu.io.nep_input import NepTrainConfig, model_from_config
    from gpumd_tpu.potentials.nep.params import num_trainable
    from gpumd_tpu.train.snes import (
        _element_index_89, fine_tune_init,
    )

    nf = 89
    cfg = NepTrainConfig(
        num_types=2, symbols=("Si", "Ge"), n_max_radial=1, n_max_angular=1,
        basis_size_radial=1, basis_size_angular=1, l_max=4, l_max_4body=0,
        neurons=2,
        fine_tune_nep_txt=str(tmp_path / "nep89.txt"),
        fine_tune_nep_restart=str(tmp_path / "nep89.restart"),
    )
    model = model_from_config(cfg)
    per_ann = (model.dim + 2) * model.neurons
    nr = na = 4
    num_tot = nf * per_ann + 1 + nf * nf * (nr + na)
    rmu = np.arange(num_tot, dtype=float)
    rsig = rmu + 0.5
    np.savetxt(tmp_path / "nep89.restart", np.stack([rmu, rsig], 1))
    with open(tmp_path / "nep89.txt", "w") as f:
        for i in range(7):
            f.write(f"header{i} x y\n")
        for i in range(num_tot):
            f.write("0.0\n")
        for i in range(model.dim):
            f.write(f"{float(i + 1)}\n")

    mu, sigma, qs = fine_tune_init(model, cfg)
    assert mu.shape == (num_trainable(model),)
    e_si = _element_index_89(14)  # Si, Z=14 -> slot 13
    assert e_si == 13
    assert np.allclose(mu[:per_ann], rmu[e_si * per_ann : (e_si + 1) * per_ann])
    # global bias frozen at zero
    assert mu[2 * per_ann] == 0.0 and sigma[2 * per_ann] == 0.0
    # first c row: (t1=Si, t2=Si) of nk=0
    e_ge = _element_index_89(32)
    c0 = mu[2 * per_ann + 1]
    assert c0 == rmu[nf * per_ann + 1 + e_si * nf + e_si]
    # descriptor sigmas frozen without fine_tune_descriptor
    assert (sigma[2 * per_ann + 1 :] == 0.0).all()
    assert np.allclose(qs, np.arange(1, model.dim + 1, dtype=float))
    # element map skips Po..Ra
    assert _element_index_89(83) == 82 and _element_index_89(89) == 83


@requires_reference
def test_gnep_epoch_driver(workdir, tmp_path):
    """gnep app: Adam + cosine LR over epochs; loss drops and nep.txt
    round-trips (ref: main_gnep/fitness.cu:212-280)."""
    import shutil

    shutil.copy(os.path.join(workdir, "train.xyz"), tmp_path / "train.xyz")
    (tmp_path / "nep.in").write_text(
        """type 2 Te Pb
version 4
cutoff 6 4
n_max 3 3
basis_size 3 3
l_max 4 0 0
neuron 8
batch 8
epoch 6
start_lr 5e-3
stop_lr 1e-4
output_interval 4
"""
    )
    from gpumd_tpu.app.gnep import main as gnep_main

    gnep_main([str(tmp_path)])
    loss = np.loadtxt(tmp_path / "loss.out")
    # ref 10-column rows: epoch, total, e/f/v train, e/f/v test, lr, time
    # (fitness.cu:513-527)
    assert loss.shape == (6, 10)
    assert loss[-1, 1] < loss[0, 1]  # total loss decreased
    # cosine schedule decayed the lr (col 8); test cols zero w/o test.xyz
    assert loss[-1, 8] < loss[0, 8]
    assert (loss[:, 5:8] == 0.0).all()
    # per-epoch checkpoints exist (report_error writes nep.txt +
    # gnep.restart every epoch)
    assert (tmp_path / "gnep.restart").exists()
    from gpumd_tpu.potentials.nep import NEP

    nep = NEP.from_file(str(tmp_path / "nep.txt"))
    assert nep.model.num_types == 2


@requires_reference
@pytest.mark.slow
def test_gnep_restart_resumes_identically(workdir, tmp_path):
    """A gnep run killed mid-way and resumed from gnep.restart +
    gnep_adam.npz continues bit-identically (Adam moments, step counter,
    grad-norm EMA, and batch order all restored)."""
    import shutil

    nep_in = """type 2 Te Pb
version 4
cutoff 6 4
n_max 2 2
basis_size 2 2
l_max 4 0 0
neuron 6
batch 8
epoch 6
start_lr 5e-3
stop_lr 1e-4
"""
    a = tmp_path / "a"
    b = tmp_path / "b"
    for d in (a, b):
        d.mkdir()
        shutil.copy(os.path.join(workdir, "train.xyz"), d / "train.xyz")
        (d / "nep.in").write_text(nep_in)
    from gpumd_tpu.app.gnep import main as gnep_main

    gnep_main([str(a)])  # uninterrupted
    gnep_main([str(b)], stop_after=3)  # killed after epoch 3...
    gnep_main([str(b)])  # ...and resumed
    la = np.loadtxt(a / "loss.out")
    lb = np.loadtxt(b / "loss.out")
    # identical losses/lr everywhere (col 9 is wall time)
    np.testing.assert_array_equal(la[:, :9], lb[:, :9])
    assert (a / "nep.txt").read_text() == (b / "nep.txt").read_text()
    assert (a / "gnep.restart").read_text() == (b / "gnep.restart").read_text()


def test_atomic_v_dipole_training(tmp_path):
    """atomic_v: per-atom dipole targets (adipole columns) drive the
    tensor loss; the per-atom attribution sums to the global dipole."""
    import jax

    from gpumd_tpu.io.nep_input import NepTrainConfig, model_from_config
    from gpumd_tpu.io.xyz import XYZFrame
    from gpumd_tpu.potentials.nep.params import (
        num_trainable, params_from_vector,
    )
    from gpumd_tpu.train.dataset import batch_structures
    from gpumd_tpu.train.nep_train import batched_forward
    from gpumd_tpu.train.snes import per_type_rmses

    rng = np.random.default_rng(7)
    frames = []
    for _ in range(3):
        pos = rng.uniform(0, 6.0, (6, 3))
        f = XYZFrame(
            symbols=["O", "H", "H"] * 2, positions=pos,
            lattice=np.diag([6.0] * 3), pbc=(True, True, True),
            info={"energy": "0", "dipole": "0.1 0.2 0.3"},
        )
        f.arrays["adipole"] = rng.normal(0, 0.1, (6, 3))
        frames.append(f)
    cfg = NepTrainConfig(
        model_type=1, num_types=2, symbols=("O", "H"), rc_radial=5.0,
        rc_angular=3.0, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=4, l_max_4body=0,
        neurons=4, atomic_v=1,
    )
    model = model_from_config(cfg)
    batch = batch_structures(frames, cfg.symbols, rc=5.0, mn=40,
                             model_type=1)
    assert batch.avirial_ref is not None
    assert float(batch.has_avirial.sum()) == 3.0
    theta = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.3, num_trainable(model)),
        jnp.float64,
    )
    params = params_from_vector(model, theta)
    out = batched_forward(model, params, batch)
    # per-atom dipoles sum to the global dipole exactly
    np.testing.assert_allclose(
        np.asarray(out.avirial[..., :3].sum(axis=1)),
        np.asarray(out.virial[:, :3]), rtol=1e-5, atol=1e-6,
    )
    e, f_, v, q, b = per_type_rmses(model, cfg, out, batch)
    assert np.isfinite(np.asarray(v)).all() and float(v[-1]) > 0.0


def test_energy_shift_invariance():
    """do_shift makes the energy fitness invariant to a constant per-atom
    offset (ref: dataset.cu:823-922 gpu_get_energy_shift; fitness.cu passes
    do_shift=true for every population evaluation) — the trainer never has
    to evolve the constant through SNES."""
    from gpumd_tpu.io.nep_input import NepTrainConfig
    from gpumd_tpu.potentials.nep.params import NepModel
    from gpumd_tpu.train.nep_train import ConfigOutput
    from gpumd_tpu.train.snes import per_type_rmses

    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("A", "B"),
        atomic_numbers=(1, 2), rc_radial=(6.0, 6.0), rc_angular=(4.0, 4.0),
        mn_radial=8, mn_angular=8, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=4,
    )
    cfg = NepTrainConfig(num_types=2, symbols=("A", "B"))

    class FakeBatch:
        type = jnp.asarray([[0, 0], [0, 1]])
        mask = jnp.ones((2, 2))
        n_atoms = jnp.asarray([2, 2])
        num_configs = 2
        energy_ref = jnp.asarray([0.0, 0.0])
        force_ref = jnp.zeros((2, 2, 3))
        virial_ref = jnp.zeros((2, 6))
        has_virial = jnp.asarray([1.0, 1.0])
        weight = jnp.ones(2)
        energy_weight = jnp.ones(2)

    out0 = ConfigOutput(
        energy=jnp.asarray([2.0, 4.0]),
        force=jnp.zeros((2, 2, 3)),
        virial=jnp.zeros((2, 6)),
    )
    # same energies + 100 eV/atom constant offset
    out1 = ConfigOutput(
        energy=out0.energy + 100.0 * FakeBatch.n_atoms,
        force=out0.force, virial=out0.virial,
    )
    e0, _, _, _, _, s0 = per_type_rmses(
        model, cfg, out0, FakeBatch(), do_shift=True, return_shift=True)
    e1, _, _, _, _, s1 = per_type_rmses(
        model, cfg, out1, FakeBatch(), do_shift=True, return_shift=True)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-6)
    assert np.isclose(float(s1) - float(s0), 100.0)
    # global row: de = (1, 2), shift = 1.5 -> rmse = 0.5
    assert np.isclose(float(e0[2]), 0.5)


def test_global_bias_absorbs_shift():
    """Adding the shift to the b1 slot lowers predicted energies by the
    shift (ref: fitness.cu:457 elite[last_ann] += shift; our ANN also
    SUBTRACTS b1)."""
    import jax
    from gpumd_tpu.potentials.nep.params import (
        NepModel, global_bias_index, num_trainable, params_from_vector,
        random_params,
    )

    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("A", "B"),
        atomic_numbers=(1, 2), rc_radial=(6.0, 6.0), rc_angular=(4.0, 4.0),
        mn_radial=8, mn_angular=8, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=4,
    )
    d = num_trainable(model)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.uniform(-1, 1, d))
    p0 = params_from_vector(model, theta)
    p1 = params_from_vector(model, theta.at[global_bias_index(model)].add(2.5))
    assert np.isclose(float(p1.b1 - p0.b1), 2.5)
    # every other leaf unchanged
    for name in ("w0", "b0", "w1", "c_radial", "c_angular", "q_scaler"):
        a0, a1 = getattr(p0, name), getattr(p1, name)
        if a0 is not None:
            np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


@requires_reference
def test_train_chunk_env_keeps_report_boundaries(workdir, tmp_path,
                                                 monkeypatch):
    """GPUMD_TRAIN_CHUNK bounds the fused dispatch size (one device RPC
    per chunk — a wedged axon RPC then costs at most `chunk` generations)
    WITHOUT changing loss.out: rows stay on output_interval boundaries
    and carry the same generation numbers as an unchunked run."""
    import shutil

    from gpumd_tpu.app.nep import main

    a = tmp_path / "whole"
    b = tmp_path / "chunked"
    for d in (a, b):
        d.mkdir()
        shutil.copy(os.path.join(workdir, "train.xyz"), d)
        shutil.copy(os.path.join(workdir, "nep.in"), d)
    monkeypatch.delenv("GPUMD_TRAIN_CHUNK", raising=False)
    main([str(a)])
    monkeypatch.setenv("GPUMD_TRAIN_CHUNK", "3")  # does not divide 10
    main([str(b)])
    la = np.atleast_2d(np.loadtxt(a / "loss.out"))
    lb = np.atleast_2d(np.loadtxt(b / "loss.out"))
    # same report rows: generations 10, 20, 30 (not every chunk)
    np.testing.assert_array_equal(la[:, 0], lb[:, 0])
    assert list(lb[:, 0]) == [10.0, 20.0, 30.0]
