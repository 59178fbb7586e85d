"""TNEP dipole/polarizability observers (rotation equivariance + app dumps)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpumd_tpu.io.xyz import read_xyz, write_xyz
from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
from gpumd_tpu.neighbor.neighbor import neighbor_brute
from gpumd_tpu.potentials.nep import NEP

from conftest import requires_reference

MODELS = "/root/reference/tests_pytest/fixtures/models"
STRUCTS = "/root/reference/tests_pytest/fixtures/structures"


@requires_reference
def test_dipole_equivariance():
    nep = NEP.from_file(f"{MODELS}/tnep-water-polarization.txt")
    assert nep.model.model_type == 1
    f = read_xyz(f"{STRUCTS}/water-nat63-from-md.xyz")
    types = jnp.asarray([nep.model.symbols.index(s) for s in f.symbols])
    box = Box.from_lattice(f.lattice, pbc=f.pbc)
    mask = jnp.ones(f.n_atoms)
    reps = num_replicas_for_cutoff(box, nep.rc)
    nbr = neighbor_brute(jnp.asarray(f.positions), box, mask,
                         rc=nep.rc, mn=512, reps=reps)
    mu = np.asarray(nep.dipole(types, nbr, mask))
    assert np.isfinite(mu).all() and np.linalg.norm(mu) > 1e-3
    th = 0.9
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    box_r = Box.from_lattice(f.lattice @ R.T, pbc=f.pbc)
    nbr_r = neighbor_brute(jnp.asarray(f.positions @ R.T), box_r, mask,
                           rc=nep.rc, mn=512, reps=reps)
    mu_r = np.asarray(nep.dipole(types, nbr_r, mask))
    assert np.allclose(R @ mu, mu_r, atol=1e-10)


@requires_reference
def test_polarizability_symmetric_equivariant():
    nep = NEP.from_file(f"{MODELS}/tnep-BaZrO3-susceptibility.txt")
    assert nep.model.model_type == 2
    f = read_xyz(f"{STRUCTS}/BaZrO3-nat40-rattled.xyz")
    types = jnp.asarray([nep.model.symbols.index(s) for s in f.symbols])
    box = Box.from_lattice(f.lattice, pbc=f.pbc)
    mask = jnp.ones(f.n_atoms)
    reps = num_replicas_for_cutoff(box, nep.rc)
    nbr = neighbor_brute(jnp.asarray(f.positions), box, mask,
                         rc=nep.rc, mn=640, reps=reps)
    p = np.asarray(nep.polarizability(types, nbr, mask))
    assert np.abs(p - p.T).max() < 1e-10
    th = 0.7
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1.0, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    box_r = Box.from_lattice(f.lattice @ R.T, pbc=f.pbc)
    nbr_r = neighbor_brute(jnp.asarray(f.positions @ R.T), box_r, mask,
                           rc=nep.rc, mn=640, reps=reps)
    p_r = np.asarray(nep.polarizability(types, nbr_r, mask))
    assert np.allclose(R @ p @ R.T, p_r, atol=1e-8)


@requires_reference
def test_app_dump_dipole(tmp_path):
    import shutil

    from gpumd_tpu.app.gpumd import Session

    f = read_xyz(f"{STRUCTS}/water-nat63-from-md.xyz")
    write_xyz(str(tmp_path / "model.xyz"), f)
    shutil.copy(f"{MODELS}/nep_water.txt", tmp_path / "pes.txt")
    shutil.copy(f"{MODELS}/tnep-water-polarization.txt", tmp_path / "tnep.txt")
    (tmp_path / "run.in").write_text(
        """potential pes.txt
potential tnep.txt
velocity 300
time_step 0.5
ensemble nve
dump_dipole 2
run 4
"""
    )
    Session(str(tmp_path), quiet=True).execute()
    data = np.loadtxt(tmp_path / "dipole.out")
    assert data.shape == (2, 4)
    assert np.isfinite(data).all()


def test_tnep_dipole_training(tmp_path):
    """SNES trains a dipole model (train_mode 1): dipole refs ride the
    virial slots and the dipole RMSE drops (ref: tnep.cu, structure.cu:351)."""
    import numpy as np
    from gpumd_tpu.app.nep import main as nep_main
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    rng = np.random.default_rng(3)
    frames = []
    lines = []
    for c in range(6):
        n = 4
        pos = rng.random((n, 3)) * 4.0 + 1.0
        mu = rng.normal(size=3) * 0.5
        lines.append(f"{n}")
        lat = "6 0 0 0 6 0 0 0 6"
        lines.append(
            f'Lattice="{lat}" Properties=species:S:1:pos:R:3 '
            f'dipole="{mu[0]:.6f} {mu[1]:.6f} {mu[2]:.6f}" pbc="T T T"'
        )
        for i in range(n):
            s = "O" if i % 2 == 0 else "H"
            lines.append(f"{s} {pos[i,0]:.6f} {pos[i,1]:.6f} {pos[i,2]:.6f}")
    (tmp_path / "train.xyz").write_text("\n".join(lines) + "\n")
    (tmp_path / "nep.in").write_text(
        """type 2 O H
version 4
model_type 1
cutoff 5 4
n_max 3 3
basis_size 3 3
l_max 4 0 0
neuron 8
lambda_v 1.0
population 12
generation 40
batch 6
output_interval 10
"""
    )
    nep_main([str(tmp_path)])
    loss = np.loadtxt(tmp_path / "loss.out")
    # dipole loss (rmse_v column) decreased
    # tensorial loss.out: gen, total, L1, L2, v_train, v_test
    # (ref fitness.cu dipole/pol branch)
    assert loss.shape[1] == 6
    assert loss[-1, 4] < loss[0, 4]
    head = (tmp_path / "nep.txt").read_text().split()[0]
    assert head == "nep4_dipole"


def test_tnep_polarizability_training(tmp_path):
    """train_mode 2: two-ANN parameter vector and pol refs (Voigt)."""
    import numpy as np
    from gpumd_tpu.app.nep import main as nep_main

    rng = np.random.default_rng(4)
    lines = []
    for c in range(4):
        n = 4
        pos = rng.random((n, 3)) * 4.0 + 1.0
        p9 = rng.normal(size=9) * 0.3
        p9[1] = p9[3]; p9[2] = p9[6]; p9[5] = p9[7]  # symmetric
        lines.append(f"{n}")
        pol = " ".join(f"{x:.6f}" for x in p9)
        lines.append(
            f'Lattice="6 0 0 0 6 0 0 0 6" Properties=species:S:1:pos:R:3 '
            f'pol="{pol}" pbc="T T T"'
        )
        for i in range(n):
            s = "O" if i % 2 == 0 else "H"
            lines.append(f"{s} {pos[i,0]:.6f} {pos[i,1]:.6f} {pos[i,2]:.6f}")
    (tmp_path / "train.xyz").write_text("\n".join(lines) + "\n")
    (tmp_path / "nep.in").write_text(
        """type 2 O H
version 4
model_type 2
cutoff 5 4
n_max 2 2
basis_size 2 2
l_max 4 0 0
neuron 6
lambda_v 1.0
population 10
generation 30
batch 4
output_interval 10
"""
    )
    nep_main([str(tmp_path)])
    loss = np.loadtxt(tmp_path / "loss.out")
    # tensorial loss.out: gen, total, L1, L2, v_train, v_test
    # (ref fitness.cu dipole/pol branch)
    assert loss.shape[1] == 6
    assert loss[-1, 4] < loss[0, 4]
    head = (tmp_path / "nep.txt").read_text().split()[0]
    assert head == "nep4_polarizability"
