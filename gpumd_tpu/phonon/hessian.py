"""Phonons: finite-difference force constants -> dynamical matrix ->
dispersion along a k-path.

Matches the reference workflow (ref: src/phonon/hessian.cu): the system is
a (cx, cy, cz) supercell of a primitive basis (atom n belongs to basis
n % num_basis); each basis atom is displaced +-delta in x/y/z and force
constants are read off the force response; D(k) is assembled with
exp(i k . r) phases and diagonalized; omega^2 in THz^2 goes to omega2.out
(natural->THz^2 factor 1e6/TIME_UNIT_CONVERSION^2, hessian.cu:352-357).

kpoints.in: lines `kx ky kz name` (fractional, primitive reciprocal
coordinates); blank lines split path segments; 100 interpolation points
per leg (hessian.cu:110-180).

TPU-native: all 6*num_basis force evaluations run as one vmapped/jit
batch; the small hermitian eigenproblem is solved host-side with numpy
(the reference uses cuSOLVER).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import TIME_UNIT_CONVERSION


def parse_kpoints_in(path: str):
    """Returns (segments, names): segments = list of lists of frac k."""
    segments: List[List[np.ndarray]] = []
    names: List[str] = []
    cur: List[np.ndarray] = []
    cur_names: List[str] = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks:
                if cur:
                    segments.append(cur)
                    names.append(" ".join(cur_names))
                    cur, cur_names = [], []
                continue
            if toks[0].startswith("#"):
                continue
            if len(toks) < 4:
                raise ValueError("kpoints.in needs `kx ky kz name` per line")
            cur.append(np.array([float(x) for x in toks[:3]]))
            cur_names.append(toks[3])
    if cur:
        segments.append(cur)
        names.append(" ".join(cur_names))
    return segments, names


def build_kpath(segments, prim_lattice_rows: np.ndarray, points_per_leg=100):
    """Interpolate Cartesian k-points along the path; returns
    (kpoints (K,3), kpath (K,), sym_positions)."""
    rec = 2.0 * np.pi * np.linalg.inv(prim_lattice_rows).T  # rows b1,b2,b3
    kpts = []
    kpath = [0.0]
    sym_pos = [0.0]
    first = segments[0][0] @ rec
    kpts.append(first)
    for seg in segments:
        for i in range(1, len(seg)):
            start = seg[i - 1] @ rec
            end = seg[i] @ rec
            last = kpts[-1]
            for j in range(1, points_per_leg + 1):
                k = start + (end - start) * (j / points_per_leg)
                kpath.append(kpath[-1] + np.linalg.norm(k - last))
                kpts.append(k)
                last = k
            sym_pos.append(kpath[-1])
    return np.array(kpts), np.array(kpath), np.array(sym_pos)


def force_constants(
    ff: ForceField, state: MDState, basis_indices, displacement: float
):
    """Phi[b, alpha, j, beta] = -dF_j,beta / du_b,alpha by central
    differences; one vmapped batch of 6*num_basis force passes."""
    nb = len(basis_indices)
    n = state.position.shape[0]
    disp_specs = []
    for b in basis_indices:
        for alpha in range(3):
            for sgn in (+1.0, -1.0):
                disp_specs.append((b, alpha, sgn))
    atoms = jnp.asarray([s[0] for s in disp_specs])
    comps = jnp.asarray([s[1] for s in disp_specs])
    signs = jnp.asarray([s[2] for s in disp_specs], state.position.dtype)

    def one(atom, comp, sgn):
        delta = (
            jnp.zeros((n, 3), state.position.dtype)
            .at[atom, comp]
            .set(sgn * displacement)
        )
        out = ff.compute(state._replace(position=state.position + delta))
        return out.force

    forces = jax.jit(
        lambda a, c, s: jax.lax.map(lambda args: one(*args), (a, c, s))
    )(atoms, comps, signs)
    forces = np.asarray(forces).reshape(nb, 3, 2, n, 3)
    # Phi = -dF/du
    phi = -(forces[:, :, 0] - forces[:, :, 1]) / (2.0 * displacement)
    return phi  # (nb, 3, N, 3)


def compute_phonon_dispersion(
    ff: ForceField,
    state: MDState,
    cxyz: Tuple[int, int, int],
    displacement: float,
    workdir: str = ".",
    masses=None,
):
    n = state.position.shape[0]
    num_basis = n // (cxyz[0] * cxyz[1] * cxyz[2])
    basis = list(range(num_basis))
    label = np.arange(n) % num_basis
    mass = np.asarray(state.mass)[:num_basis] if masses is None else masses

    phi = force_constants(ff, state, basis, displacement)

    # primitive lattice: supercell lattice / replication (rows = vectors)
    sup_rows = np.asarray(state.box.h).T
    prim_rows = sup_rows / np.asarray(cxyz)[:, None]
    segments, names = parse_kpoints_in(os.path.join(workdir, "kpoints.in"))
    kpts, kpath, sym_pos = build_kpath(segments, prim_rows)

    pos = np.asarray(state.position)
    # minimum-image displacement r_j - r_b for the phase factor
    hinv = np.linalg.inv(np.asarray(state.box.h))
    omega2 = np.zeros((len(kpts), num_basis * 3))
    dim = num_basis * 3
    d_rows = []  # D(k) dump rows (ref: doc/gpumd/output_files/D_out.rst)
    # assemble per-pair displacement with MIC
    for ik, k in enumerate(kpts):
        d = np.zeros((dim, dim), dtype=complex)
        for b in range(num_basis):
            r12 = pos - pos[b]
            s = r12 @ hinv.T
            s -= np.round(s)
            r12 = s @ np.asarray(state.box.h).T
            phase = np.exp(1j * (r12 @ k))  # (N,)
            w = phase / np.sqrt(mass[b] * mass[label])
            for j_basis in range(num_basis):
                sel = label == j_basis
                block = np.einsum(
                    "anb,n->ab", phi[b][:, sel, :], w[sel]
                )
                d[3 * b : 3 * b + 3, 3 * j_basis : 3 * j_basis + 3] = block
        d = 0.5 * (d + d.conj().T)
        omega2[ik] = np.linalg.eigvalsh(d)
        d_rows.append(np.hstack([d.real, d.imag]))

    natural_to_thz2 = 1.0e6 / TIME_UNIT_CONVERSION**2
    omega2 *= natural_to_thz2
    # D.out: 3*N_basis rows per k-point, [real | imag] column blocks
    # (ref: hessian.cu output_D / D_out.rst)
    with open(os.path.join(workdir, "D.out"), "w") as f:
        for dmat in d_rows:
            for row in dmat * natural_to_thz2:
                f.write(" ".join(f"{x:g}" for x in row) + "\n")
    with open(os.path.join(workdir, "omega2.out"), "w") as f:
        f.write("#")
        for s in sym_pos:
            f.write(f" {s:.6f}")
        f.write(" ")
        f.write("|".join(names))
        f.write("\n")
        for ik in range(len(kpts)):
            f.write(f"{kpath[ik]:.6f} ")
            f.write(" ".join(f"{w:g}" for w in omega2[ik]))
            f.write("\n")
    return kpath, omega2
