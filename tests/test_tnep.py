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
