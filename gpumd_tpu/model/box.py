"""Simulation box: triclinic h-matrix, minimum image, volume/thickness.

Matches the reference semantics (ref: src/model/box.cuh:18-129):
the h matrix columns are the lattice vectors a, b, c, so Cartesian
coordinates are r = h @ s for fractional s.  model.xyz's `Lattice=`
attribute lists the lattice vectors as rows (ax ay az bx ...), i.e.
h = lattice.T.

Unlike the reference (a C struct with orthogonal fast path), Box is a
JAX pytree and all ops are branch-free so they trace under jit; XLA
fuses the 3x3 matmuls into the surrounding kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def inv3(h):
    """Explicit 3x3 inverse via the adjugate — avoids LU decomposition
    (unsupported for f64 on TPU) and fuses into surrounding kernels."""
    a, b, c = h[..., :, 0], h[..., :, 1], h[..., :, 2]
    bxc = jnp.cross(b, c)
    cxa = jnp.cross(c, a)
    axb = jnp.cross(a, b)
    det = jnp.sum(a * bxc, axis=-1, keepdims=True)[..., None]
    return jnp.stack([bxc, cxa, axb], axis=-2) / det


def det3(h):
    a, b, c = h[..., :, 0], h[..., :, 1], h[..., :, 2]
    return jnp.sum(a * jnp.cross(b, c), axis=-1)


def _matvec3(m, v):
    """y_k = sum_j m[k, j] v_j with v given as (..., 3) array or a list of
    three (...,) components; returns a LIST of components (callers stack
    only when a (..., 3) result is genuinely needed)."""
    if isinstance(v, (list, tuple)):
        vx, vy, vz = v
    else:
        vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    m = m.astype(vx.dtype)
    return [m[k, 0] * vx + m[k, 1] * vy + m[k, 2] * vz for k in range(3)]


class Box(NamedTuple):
    """Triclinic periodic box.

    Attributes:
      h: (3, 3) matrix whose COLUMNS are the lattice vectors a, b, c.
      h_inv: (3, 3) inverse of h (rows are reciprocal vectors / 2pi).
      pbc: (3,) float mask, 1.0 where periodic, 0.0 otherwise.
    """

    h: jnp.ndarray
    h_inv: jnp.ndarray
    pbc: jnp.ndarray

    @staticmethod
    def from_lattice(lattice, pbc=(True, True, True), dtype=None) -> "Box":
        """Build from a row-major lattice (rows = a, b, c), as in model.xyz."""
        lat = jnp.asarray(lattice, dtype=dtype).reshape(3, 3)
        h = lat.T
        return Box(h=h, h_inv=inv3(h), pbc=jnp.asarray(pbc, dtype=h.dtype))

    @staticmethod
    def orthogonal(lengths, pbc=(True, True, True), dtype=None) -> "Box":
        lengths = jnp.asarray(lengths, dtype=dtype)
        return Box.from_lattice(jnp.diag(lengths), pbc=pbc, dtype=dtype)

    def with_h(self, h) -> "Box":
        """Return a new Box with an updated h matrix (e.g. after a barostat step)."""
        return Box(h=h, h_inv=inv3(h), pbc=self.pbc)

    @property
    def volume(self):
        return jnp.abs(det3(self.h))

    def thickness(self):
        """Perpendicular slab thicknesses d_k = V / |cross of the other two|.

        (ref: box.cu computes thickness_x = V/area(bxc) etc.)
        """
        a, b, c = self.h[:, 0], self.h[:, 1], self.h[:, 2]
        v = jnp.abs(jnp.dot(a, jnp.cross(b, c)))
        areas = jnp.stack(
            [
                jnp.linalg.norm(jnp.cross(b, c)),
                jnp.linalg.norm(jnp.cross(c, a)),
                jnp.linalg.norm(jnp.cross(a, b)),
            ]
        )
        return v / areas

    def minimum_image(self, r12):
        """Apply the minimum-image convention to displacement vectors.

        Args:
          r12: (..., 3) Cartesian displacements.
        Returns:
          (..., 3) wrapped displacements. Non-periodic directions untouched.

        Implemented with explicit per-component arithmetic: a (...,3)@(3,3)
        matmul would be padded to 128 lanes by XLA:TPU (42x the work).
        """
        s = _matvec3(self.h_inv, r12)
        s = [si - jnp.round(si) * self.pbc[k] for k, si in enumerate(s)]
        return jnp.stack(_matvec3(self.h, s), axis=-1)

    def wrap(self, positions):
        """Wrap positions into the primary cell [0, 1) in fractional space
        along periodic directions (ref: force.cu:424-459 gpu_apply_pbc)."""
        s = _matvec3(self.h_inv, positions)
        s = [si - jnp.floor(si) * self.pbc[k] for k, si in enumerate(s)]
        return jnp.stack(_matvec3(self.h, s), axis=-1)

    def fractional(self, positions):
        return jnp.stack(_matvec3(self.h_inv, positions), axis=-1)

    def cartesian(self, frac):
        return jnp.stack(_matvec3(self.h, frac), axis=-1)


def num_replicas_for_cutoff(box: Box, rc: float) -> tuple[int, int, int]:
    """Host-side: number of periodic images needed per direction so every
    neighbor within rc is found (the reference's small-box "expanded box",
    ref: src/force/nep.cu:1141+, nep.cuh:102-105).

    Returns 0 for non-periodic directions; this is a static (trace-time)
    quantity — changing it triggers recompilation.
    """
    t = np.asarray(box.thickness())
    pbc = np.asarray(box.pbc)
    reps = []
    for d in range(3):
        if pbc[d] > 0:
            # After MIC the fractional displacement is in [-1/2, 1/2]; an
            # image shift n can still land within rc iff |n| <= rc/t + 1/2.
            m = int(np.ceil(rc / float(t[d]) + 0.5 - 1e-9)) - 1
            reps.append(max(0, m))
        else:
            reps.append(0)
    return tuple(reps)
