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
    # per-atom tensorial references (atomic_v; adipole/apol columns)
    avirial_ref: Optional[jnp.ndarray] = None  # (C, A, 6) Voigt
    has_avirial: Optional[jnp.ndarray] = None  # (C,)
    # qNEP training extras (charge_mode > 0; None otherwise)
    position: Optional[jnp.ndarray] = None  # (C, A, 3) absolute coords
    charge_ref: Optional[jnp.ndarray] = None  # (C,) total config charge
    bec_ref: Optional[jnp.ndarray] = None  # (C, A, 9) Born charges
    has_bec: Optional[jnp.ndarray] = None  # (C,)
    kvec: Optional[jnp.ndarray] = None  # (C, K, 3) Ewald k-vectors (padded)
    gk: Optional[jnp.ndarray] = None  # (C, K) G(k); 0 on padding

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


def ewald_kvectors(lattice, alpha: float):
    """Half-space Ewald k enumeration for one config's lattice (rows =
    a, b, c) with |k|^2 < (2 pi alpha)^2 (ref: main_nep/nep_charge.cu:
    1020-1086 find_k_and_G).  Returns (K, 3) k and (K,) G(k)."""
    h = np.asarray(lattice, np.float64).T  # columns = lattice vectors
    a1, a2, a3 = h[:, 0], h[:, 1], h[:, 2]
    det = float(np.dot(a1, np.cross(a2, a3)))
    two_pi = 2.0 * np.pi
    b1 = two_pi / det * np.cross(a2, a3)
    b2 = two_pi / det * np.cross(a3, a1)
    b3 = two_pi / det * np.cross(a1, a2)
    volume_k = two_pi**3 / abs(det)

    def area(x, y):
        return np.linalg.norm(np.cross(x, y))

    n1_max = int(alpha * two_pi * area(b2, b3) / volume_k)
    n2_max = int(alpha * two_pi * area(b3, b1) / volume_k)
    n3_max = int(alpha * two_pi * area(b1, b2) / volume_k)
    ksq_max = (two_pi * alpha) ** 2
    ks, gs = [], []
    for n1 in range(0, n1_max + 1):
        for n2 in range(-n2_max, n2_max + 1):
            for n3 in range(-n3_max, n3_max + 1):
                if n1 == 0 and n2 == 0 and n3 == 0:
                    continue
                if n1 == 0 and (n2 < 0 or (n2 == 0 and n3 < 0)):
                    continue
                k = n1 * b1 + n2 * b2 + n3 * b3
                ksq = float(np.dot(k, k))
                if ksq < ksq_max:
                    ks.append(k)
                    gs.append(
                        2.0 * abs(two_pi / det) / ksq
                        * np.exp(-ksq / (4.0 * alpha * alpha))
                    )
    if not ks:
        return np.zeros((0, 3)), np.zeros((0,))
    return np.asarray(ks), np.asarray(gs)


def _host_neighbors(pos, lattice, pbc, rc, mn, ci):
    """Pure-numpy per-frame neighbor build (MIC + periodic images).

    Dataset prep must NOT touch the accelerator: the device path
    (neighbor_brute) costs one remote compile per distinct frame shape and
    a blocking device round-trip per frame — on a tunneled TPU the PbTe
    example's 25-frame build sat for hours behind other device work
    (round-3 trainer-parity wedge).  Same semantics as neighbor_brute +
    num_replicas_for_cutoff (box.py); training cells are small, so host
    numpy is milliseconds per frame.
    """
    n = pos.shape[0]
    h = lattice.T  # columns = lattice vectors (Box convention)
    h_inv = np.linalg.inv(h)
    pbcf = np.asarray([1.0 if p else 0.0 for p in pbc])
    vol = abs(np.linalg.det(h))
    a1, a2, a3 = h[:, 0], h[:, 1], h[:, 2]
    thick = [
        vol / np.linalg.norm(np.cross(a2, a3)),
        vol / np.linalg.norm(np.cross(a3, a1)),
        vol / np.linalg.norm(np.cross(a1, a2)),
    ]
    reps = [
        max(0, int(np.ceil(rc / thick[d] + 0.5 - 1e-9)) - 1)
        if pbcf[d] > 0 else 0
        for d in range(3)
    ]
    sf = np.stack(
        np.meshgrid(*[np.arange(-r, r + 1) for r in reps], indexing="ij"),
        axis=-1,
    ).reshape(-1, 3).astype(np.float64)
    zi = int(np.argmax(np.all(sf == 0, axis=1)))
    sf[[0, zi]] = sf[[zi, 0]]  # zero shift first (self-exclusion below)
    shifts = sf @ h.T  # (n_img, 3)

    out_idx = np.zeros((n, mn), np.int32)
    out_r12 = np.full((n, mn, 3), 1.0e5, np.float64)
    out_msk = np.zeros((n, mn), np.float64)
    rc2 = rc * rc
    blk = 512
    for lo in range(0, n, blk):
        hi = min(n, lo + blk)
        rij = pos[None, :, :] - pos[lo:hi, None, :]  # j - i
        s = rij @ h_inv.T
        s = s - np.round(s) * pbcf[None, None, :]
        rij = s @ h.T
        d_all = rij[:, :, None, :] + shifts[None, None, :, :]
        d2 = np.einsum("bjmk,bjmk->bjm", d_all, d_all)
        valid = d2 < rc2
        valid[np.arange(hi - lo), np.arange(lo, hi), 0] = False  # self
        for b in range(hi - lo):
            jj, mm = np.nonzero(valid[b])
            cnt = len(jj)
            if cnt > mn:
                raise ValueError(
                    f"config {ci}: neighbor overflow ({cnt} > {mn})"
                )
            out_idx[lo + b, :cnt] = jj
            out_r12[lo + b, :cnt] = d_all[b, jj, mm]
            out_msk[lo + b, :cnt] = 1.0
    return out_idx, out_r12, out_msk


def batch_structures(
    frames: Sequence[XYZFrame],
    symbols: Sequence[str],
    rc: float,
    mn: int,
    max_atoms: Optional[int] = None,
    dtype=np.float32,
    model_type: int = 0,
    charge_mode: int = 0,
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
    position = np.zeros((c, a, 3), dtype=dtype) if charge_mode else None
    charge_ref = np.zeros((c,), dtype=dtype) if charge_mode else None
    bec_ref = np.zeros((c, a, 9), dtype=dtype) if charge_mode else None
    has_bec = np.zeros((c,), dtype=dtype) if charge_mode else None
    kg_list = [] if charge_mode else None
    alpha_ewald = np.pi / rc  # ref: nep_charge.cu:207 alpha = pi/rc_radial
    avirial_ref = None  # allocated lazily on first adipole/apol column
    has_avirial = None

    sym_index = {s: i for i, s in enumerate(symbols)}
    for ci, f in enumerate(frames):
        n = f.n_atoms
        if n > a:
            raise ValueError(f"config {ci} has {n} atoms > max_atoms {a}")
        h_idx, h_r12, h_msk = _host_neighbors(
            np.asarray(f.positions, np.float64),
            np.asarray(f.lattice, np.float64).reshape(3, 3),
            f.pbc, rc, mn, ci,
        )
        r12[ci, :n] = h_r12.astype(dtype)
        idx[ci, :n] = h_idx
        nbr_mask[ci, :n] = h_msk.astype(dtype)
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
            ad = None
            if f.arrays:
                ad = f.arrays.get("adipole", f.arrays.get("atomic_dipole"))
            if ad is not None:
                if avirial_ref is None:
                    avirial_ref = np.zeros((c, a, 6), dtype=dtype)
                    has_avirial = np.zeros((c,), dtype=dtype)
                avirial_ref[ci, :n, :3] = np.asarray(ad, dtype=dtype)
                has_avirial[ci] = 1.0
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
            ap = None
            if f.arrays:
                ap = f.arrays.get("apol",
                                  f.arrays.get("atomic_polarizability"))
            if ap is not None:
                if avirial_ref is None:
                    avirial_ref = np.zeros((c, a, 6), dtype=dtype)
                    has_avirial = np.zeros((c,), dtype=dtype)
                m9 = np.asarray(ap, dtype=dtype).reshape(n, 3, 3)
                avirial_ref[ci, :n] = np.stack(
                    [m9[:, 0, 0], m9[:, 1, 1], m9[:, 2, 2],
                     m9[:, 0, 1], m9[:, 1, 2], m9[:, 2, 0]], axis=1,
                )
                has_avirial[ci] = 1.0
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
        if charge_mode:
            position[ci, :n] = np.asarray(f.positions, dtype=dtype)
            if "charge" in f.info:
                charge_ref[ci] = float(f.info["charge"])
            bec = f.arrays.get("bec") if f.arrays else None
            if bec is not None:
                bec_ref[ci, :n] = np.asarray(bec, dtype=dtype).reshape(n, 9)
                has_bec[ci] = 1.0
            kg_list.append(ewald_kvectors(f.lattice, alpha_ewald))

    kvec = gk = None
    if charge_mode:
        kmax = max(max(len(g) for _, g in kg_list), 1)
        kvec = np.zeros((c, kmax, 3), dtype=dtype)
        gk = np.zeros((c, kmax), dtype=dtype)
        for ci, (ks, gs) in enumerate(kg_list):
            kvec[ci, : len(gs)] = ks
            gk[ci, : len(gs)] = gs

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
        avirial_ref=(jnp.asarray(avirial_ref)
                     if avirial_ref is not None else None),
        has_avirial=(jnp.asarray(has_avirial)
                     if has_avirial is not None else None),
        position=jnp.asarray(position) if position is not None else None,
        charge_ref=jnp.asarray(charge_ref) if charge_ref is not None else None,
        bec_ref=jnp.asarray(bec_ref) if bec_ref is not None else None,
        has_bec=jnp.asarray(has_bec) if has_bec is not None else None,
        kvec=jnp.asarray(kvec) if kvec is not None else None,
        gk=jnp.asarray(gk) if gk is not None else None,
    )
