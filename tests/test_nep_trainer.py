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
def test_snes_training_reduces_loss(workdir):
    from gpumd_tpu.app.nep import main

    main([workdir])
    loss = np.loadtxt(os.path.join(workdir, "loss.out"))
    assert loss.shape[1] == 7
    # fitness decreased over training
    assert loss[-1, 1] < loss[0, 1]
    # RMSE energy decreased
    assert loss[-1, 4] < loss[0, 4]
    assert os.path.exists(os.path.join(workdir, "nep.txt"))
    assert os.path.exists(os.path.join(workdir, "nep.restart"))


@requires_reference
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
