"""Lennard-Jones pair potential with per-type-pair parameters.

File format and conventions match the reference (ref: src/force/lj.cu:28-75):

    lj <num_types> <sym1> ...
    eps(0,0) sigma(0,0) cutoff(0,0)
    eps(0,1) ...                      # num_types^2 rows, row-major

Energy u(r) = 4 eps [ (sigma/r)^12 - (sigma/r)^6 ], unshifted, hard cutoff
per type pair; per-atom energy takes u/2 per ordered pair.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput, compute_from_pair_energy


class LJ(NamedTuple):
    s6e4: jnp.ndarray  # (T, T) 4*eps*sigma^6
    s12e4: jnp.ndarray  # (T, T) 4*eps*sigma^12
    cutoff_sq: jnp.ndarray  # (T, T)
    rc: float  # host-side max cutoff

    @staticmethod
    def from_params(epsilon, sigma, cutoff) -> "LJ":
        """Build from (T, T) arrays (or scalars for one type)."""
        eps = np.atleast_2d(np.asarray(epsilon, dtype=np.float64))
        sig = np.atleast_2d(np.asarray(sigma, dtype=np.float64))
        cut = np.atleast_2d(np.asarray(cutoff, dtype=np.float64))
        return LJ(
            s6e4=jnp.asarray(4.0 * eps * sig**6),
            s12e4=jnp.asarray(4.0 * eps * sig**12),
            cutoff_sq=jnp.asarray(cut**2),
            rc=float(np.max(cut)),
        )

    @staticmethod
    def from_file(path: str) -> "LJ":
        """Parse a GPUMD LJ potential file."""
        with open(path) as f:
            tokens = f.read().split()
        if tokens[0] != "lj":
            raise ValueError(f"{path}: not an LJ potential file")
        t = int(tokens[1])
        vals = [float(x) for x in tokens[2 + t :]]
        if len(vals) < 3 * t * t:
            raise ValueError(f"{path}: expected {3 * t * t} LJ parameters")
        arr = np.array(vals[: 3 * t * t]).reshape(t, t, 3)
        return LJ.from_params(arr[..., 0], arr[..., 1], arr[..., 2])

    def pair_energies(self, r12, t1, t2):
        """Per-atom energies from displacements and center/neighbor types.

        Padded slots (parked at distance 1e5) fall outside every cutoff, so
        they contribute exactly zero energy and gradient.
        """
        d2 = jnp.sum(r12 * r12, axis=-1)  # (N, MN)
        s6 = self.s6e4[t1[:, None], t2].astype(d2.dtype)
        s12 = self.s12e4[t1[:, None], t2].astype(d2.dtype)
        csq = self.cutoff_sq[t1[:, None], t2].astype(d2.dtype)
        inv2 = 1.0 / d2
        inv6 = inv2 * inv2 * inv2
        u = s12 * inv6 * inv6 - s6 * inv6
        u = jnp.where(d2 < csq, u, 0.0)
        return 0.5 * jnp.sum(u, axis=-1)

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )
