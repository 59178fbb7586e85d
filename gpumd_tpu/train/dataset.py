"""Training dataset: structures -> static batched tensors.

The reference's Dataset concatenates structures per batch and precomputes
STATIC neighbor lists and r12 displacements once (ref: src/main_nep/
dataset.cu:276-338, structure.cu:55-67) — training cells are tiny, so
virtual-image replication handles boxes thinner than 2 rc.

TPU-native: a batch is a dense (C, A, ...) pytree — C configs padded to A
atoms and MN neighbor slots; vmap rides the config axis, the mesh shards
it (batch-parallel training, SURVEY.md section 2.11).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.io.xyz import XYZFrame
from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
from gpumd_tpu.neighbor.neighbor import neighbor_brute


class StructureBatch(NamedTuple):
    """Dense batch of training configurations (all arrays jnp)."""

    # Per-pair static neighbor data (built once, like the reference).
    r12: jnp.ndarray  # (C, A, MN, 3)
    idx: jnp.ndarray  # (C, A, MN) int32 (within-config indices)
    nbr_mask: jnp.ndarray  # (C, A, MN)
    # Per-atom
    type: jnp.ndarray  # (C, A) int32
    mask: jnp.ndarray  # (C, A)
    force_ref: jnp.ndarray  # (C, A, 3)
    # Per-config
    n_atoms: jnp.ndarray  # (C,)
    energy_ref: jnp.ndarray  # (C,) total energy (eV)
    virial_ref: jnp.ndarray  # (C, 6) Voigt xx yy zz xy yz zx; NaN = absent
    has_virial: jnp.ndarray  # (C,)
    weight: jnp.ndarray  # (C,) per-config loss weight
    energy_weight: jnp.ndarray  # (C,)

    @property
    def num_configs(self) -> int:
        return self.type.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.type.shape[1]


def _parse_virial(info) -> Optional[np.ndarray]:
    """virial= / stress= 9 or 6 components -> Voigt (xx yy zz xy yz zx).
    (ref: structure.cu reads both forms; stress needs -V factor)"""
    for key in ("virial", "stress"):
        if key in info:
            vals = np.array([float(x) for x in info[key].split()])
            if vals.size == 9:
                m = vals.reshape(3, 3)
            elif vals.size == 6:
                # Voigt xx yy zz yz xz xy input order
                m = np.array(
                    [
                        [vals[0], vals[5], vals[4]],
                        [vals[5], vals[1], vals[3]],
                        [vals[4], vals[3], vals[2]],
                    ]
                )
            else:
                raise ValueError(f"{key}= must have 6 or 9 numbers")
            return key, m
    return None


def batch_structures(
    frames: Sequence[XYZFrame],
    symbols: Sequence[str],
    rc: float,
    mn: int,
    max_atoms: Optional[int] = None,
    dtype=np.float32,
    model_type: int = 0,
) -> StructureBatch:
    """Build a dense batch. Neighbor lists are computed per config with the
    brute-force + periodic-image path (training cells are small)."""
    c = len(frames)
    a = max_atoms or max(f.n_atoms for f in frames)
    r12 = np.full((c, a, mn, 3), 1.0e5, dtype=dtype)
    idx = np.zeros((c, a, mn), dtype=np.int32)
    nbr_mask = np.zeros((c, a, mn), dtype=dtype)
    type_ = np.zeros((c, a), dtype=np.int32)
    mask = np.zeros((c, a), dtype=dtype)
    force_ref = np.zeros((c, a, 3), dtype=dtype)
    n_atoms = np.zeros((c,), dtype=np.int32)
    energy_ref = np.zeros((c,), dtype=dtype)
    virial_ref = np.zeros((c, 6), dtype=dtype)
    has_virial = np.zeros((c,), dtype=dtype)
    weight = np.ones((c,), dtype=dtype)
    energy_weight = np.ones((c,), dtype=dtype)

    sym_index = {s: i for i, s in enumerate(symbols)}
    for ci, f in enumerate(frames):
        n = f.n_atoms
        if n > a:
            raise ValueError(f"config {ci} has {n} atoms > max_atoms {a}")
        box = Box.from_lattice(f.lattice, pbc=f.pbc, dtype=jnp.float64)
        reps = num_replicas_for_cutoff(box, rc)
        nbr = neighbor_brute(
            jnp.asarray(f.positions, jnp.float64),
            box,
            jnp.ones(n),
            rc=rc,
            mn=mn,
            reps=reps,
        )
        if bool(nbr.overflowed()):
            raise ValueError(
                f"config {ci}: neighbor overflow ({int(nbr.count.max())} > {mn})"
            )
        r12[ci, :n] = np.asarray(nbr.r12, dtype=dtype)
        idx[ci, :n] = np.asarray(nbr.idx)
        nbr_mask[ci, :n] = np.asarray(nbr.mask, dtype=dtype)
        type_[ci, :n] = [sym_index[s] for s in f.symbols]
        mask[ci, :n] = 1.0
        n_atoms[ci] = n
        if f.forces is not None:
            force_ref[ci, :n] = f.forces
        if "energy" in f.info:
            energy_ref[ci] = float(f.info["energy"])
        if model_type == 1:
            # TNEP dipole training: total dipole rides the virial slots
            # (ref: structure.cu:351-374)
            if "dipole" in f.info:
                mu = [float(x) for x in f.info["dipole"].split()]
                virial_ref[ci, :3] = mu
                has_virial[ci] = 1.0
            if "weight" in f.info:
                weight[ci] = float(f.info["weight"])
            continue
        if model_type == 2:
            # TNEP polarizability training: 9 -> Voigt (xx yy zz xy yz zx)
            # (ref: structure.cu:384-404 reduced_index)
            if "pol" in f.info:
                pv = np.asarray([float(x) for x in f.info["pol"].split()])
                m = pv.reshape(3, 3)
                virial_ref[ci] = [m[0, 0], m[1, 1], m[2, 2],
                                  m[0, 1], m[1, 2], m[2, 0]]
                has_virial[ci] = 1.0
            if "weight" in f.info:
                weight[ci] = float(f.info["weight"])
            continue
        v = _parse_virial(f.info)
        if v is not None:
            key, m = v
            if key == "stress":
                # stress (eV/A^3) -> virial (eV): W = -V * stress
                vol = abs(np.linalg.det(np.asarray(f.lattice)))
                m = -vol * m
            virial_ref[ci] = [m[0, 0], m[1, 1], m[2, 2], m[0, 1], m[1, 2], m[2, 0]]
            has_virial[ci] = 1.0
        if "weight" in f.info:
            weight[ci] = float(f.info["weight"])
        if "energy_weight" in f.info:
            energy_weight[ci] = float(f.info["energy_weight"])

    # Padded-atom neighbor slots point at atom 0; idx of padded rows is 0.
    return StructureBatch(
        r12=jnp.asarray(r12),
        idx=jnp.asarray(idx),
        nbr_mask=jnp.asarray(nbr_mask),
        type=jnp.asarray(type_),
        mask=jnp.asarray(mask),
        force_ref=jnp.asarray(force_ref),
        n_atoms=jnp.asarray(n_atoms),
        energy_ref=jnp.asarray(energy_ref),
        virial_ref=jnp.asarray(virial_ref),
        has_virial=jnp.asarray(has_virial),
        weight=jnp.asarray(weight),
        energy_weight=jnp.asarray(energy_weight),
    )
