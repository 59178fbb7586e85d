"""Tersoff bond-order potentials (1989 form; 1988/mini variants follow).

File format (ref: src/force/tersoff1989.cu:28-140):
    tersoff_1989 <1|2> <syms>
    A B lambda mu beta n c d h r1 r2          (type 0)
    [A B lambda mu beta n c d h r1 r2]        (type 1)
    [chi]                                     (0-1 mixing for B)
Mixed pair parameters: geometric means for A, B (x chi), r1, r2; arithmetic
for lambda, mu.  The bond-order angular term uses the CENTER atom's
(beta, n, c, d, h).

Energy (per ordered pair, halved):
    E_i = 1/2 sum_j fc(r_ij) [ A e^{-lambda r} - b_ij B e^{-mu r} ]
    b_ij = (1 + (beta zeta_ij)^n)^{-1/(2n)}
    zeta_ij = sum_{k != i,j} fc(r_ik) g(cos theta_ijk)
    g = 1 + c^2/d^2 - c^2/(d^2 + (cos - h)^2)

The reference computes forces with two analytic kernels (bond order then
force, tersoff1989.cu:337-520); here the same energy expression is written
once and differentiated (the three-body zeta term makes the backward pass
an O(MN^2) contraction, which XLA batches onto the MXU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput, compute_from_pair_energy


class TersoffMini(NamedTuple):
    """Mini-Tersoff (Fan 2019), 1-2 elements.

    File (ref: src/force/tersoff_mini.cu:30-85): per pair-class entry
    (2T-1 entries indexed by t1+t2):  D0 alpha r0 S beta n h r1 r2
    converted to A/B/lambda/mu form; angular g = (h - cos)^2.
    """

    a: jnp.ndarray  # (P,) pair-class arrays, P = 2T-1
    b: jnp.ndarray
    lam: jnp.ndarray
    mu: jnp.ndarray
    beta: jnp.ndarray
    n: jnp.ndarray
    h: jnp.ndarray
    r1: jnp.ndarray
    r2: jnp.ndarray
    rc: float

    @staticmethod
    def from_file(path: str) -> "TersoffMini":
        with open(path) as f:
            tokens = f.read().split()
        if tokens[0] != "tersoff_mini":
            raise ValueError(f"{path}: not a tersoff_mini file")
        t = int(tokens[1])
        n_entries = 2 * t - 1
        vals = np.array(
            [float(x) for x in tokens[2 + t : 2 + t + 9 * n_entries]]
        ).reshape(n_entries, 9)
        d0, alpha, r0, s = vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
        return TersoffMini(
            a=jnp.asarray(d0 / (s - 1) * np.exp(np.sqrt(2 * s) * alpha * r0)),
            b=jnp.asarray(
                s * d0 / (s - 1) * np.exp(np.sqrt(2 / s) * alpha * r0)
            ),
            lam=jnp.asarray(np.sqrt(2 * s) * alpha),
            mu=jnp.asarray(np.sqrt(2 / s) * alpha),
            beta=jnp.asarray(vals[:, 4]),
            n=jnp.asarray(vals[:, 5]),
            h=jnp.asarray(vals[:, 6]),
            r1=jnp.asarray(vals[:, 7]),
            r2=jnp.asarray(vals[:, 8]),
            rc=float(vals[:, 8].max()),
        )

    def pair_energies(self, r12, t1, t2, block: int = 2048):
        nloc = r12.shape[0]
        if nloc <= block:
            return self._block_energy(r12, t1, t2)
        blk_fn = jax.checkpoint(self._block_energy)
        nb = -(-nloc // block)
        pad = nb * block - nloc
        r12p = jnp.pad(r12, ((0, pad), (0, 0), (0, 0)), constant_values=1e5)
        t1p = jnp.pad(t1, (0, pad))
        t2p = jnp.pad(t2, ((0, pad), (0, 0)))
        e = jax.lax.map(
            lambda args: blk_fn(*args),
            (
                r12p.reshape(nb, block, *r12.shape[1:]),
                t1p.reshape(nb, block),
                t2p.reshape(nb, block, -1),
            ),
        )
        return e.reshape(-1)[:nloc]

    def _block_energy(self, r12, t1, t2):
        dtype = r12.dtype
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
        tp = t1[:, None] + t2  # pair-class index (ref: type12 = t1 + t2)
        r1p = self.r1[tp].astype(dtype)
        r2p = self.r2[tp].astype(dtype)
        x = jnp.clip((d - r1p) / jnp.maximum(r2p - r1p, 1e-30), 0.0, 1.0)
        fc = jnp.where(d < r2p, 0.5 * (1.0 + jnp.cos(jnp.pi * x)), 0.0)
        dsafe = jnp.minimum(d, r2p)
        fr = self.a[tp].astype(dtype) * jnp.exp(-self.lam[tp].astype(dtype) * dsafe)
        fa = self.b[tp].astype(dtype) * jnp.exp(-self.mu[tp].astype(dtype) * dsafe)

        u = r12 / d[..., None]
        cosjk = jnp.einsum("pma,pka->pmk", u, u)
        hh = self.h[tp].astype(dtype)[..., None]  # h of the i-j pair
        g = (hh - cosjk) ** 2
        not_self = 1.0 - jnp.eye(fc.shape[-1], dtype=dtype)
        zeta = jnp.einsum("pk,pmk,mk->pm", fc, g, not_self)

        beta = self.beta[tp].astype(dtype)
        nn = self.n[tp].astype(dtype)
        zeta_ok = zeta > 1e-16
        bzn = jnp.where(
            zeta_ok, (beta * jnp.where(zeta_ok, zeta, 1.0)) ** nn, 0.0
        )
        bij = (1.0 + bzn) ** (-0.5 / nn)
        return jnp.sum(0.5 * fc * (fr - bij * fa), axis=-1)

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )


class Tersoff1988(NamedTuple):
    """Full-parameter Tersoff (1988), triple-indexed.

    File (ref: src/force/tersoff1988.cu:57-180): `tersoff_1988 T syms`,
    then T^3 entries of 14 values:
        A B lambda mu beta n c d h r1 r2 m alpha gamma
    zeta_ij = sum_k fc^{ijk}(r13) gamma^{ijk} g^{ijk}(cos) e^{ijk},
    e = exp(alpha (d12-d13)^m) (m = 1 or 3; alpha < eps -> 1),
    g = gamma (1 + c^2/d^2 - c^2/(d^2 + (h-cos)^2)),
    pair terms and (beta, n) indexed by the (i, j, j) entry.
    """

    p: jnp.ndarray  # (T^3, 14) raw parameter table
    num_types: int
    rc: float

    _A, _B, _LAM, _MU, _BETA, _EN, _C, _D, _H, _R1, _R2, _M, _ALPHA, _GAMMA = range(14)

    @staticmethod
    def from_file(path: str) -> "Tersoff1988":
        with open(path) as f:
            tokens = f.read().split()
        if tokens[0] != "tersoff_1988":
            raise ValueError(f"{path}: not a tersoff_1988 file")
        t = int(tokens[1])
        n_entries = t * t * t
        vals = np.array(
            [float(x) for x in tokens[2 + t : 2 + t + 14 * n_entries]]
        ).reshape(n_entries, 14)
        return Tersoff1988(
            p=jnp.asarray(vals), num_types=t, rc=float(vals[:, 10].max())
        )

    def pair_energies(self, r12, t1, t2, block: int = 2048):
        nloc = r12.shape[0]
        if nloc <= block:
            return self._block_energy(r12, t1, t2)
        blk_fn = jax.checkpoint(self._block_energy)
        nb = -(-nloc // block)
        pad = nb * block - nloc
        r12p = jnp.pad(r12, ((0, pad), (0, 0), (0, 0)), constant_values=1e5)
        t1p = jnp.pad(t1, (0, pad))
        t2p = jnp.pad(t2, ((0, pad), (0, 0)))
        e = jax.lax.map(
            lambda args: blk_fn(*args),
            (
                r12p.reshape(nb, block, *r12.shape[1:]),
                t1p.reshape(nb, block),
                t2p.reshape(nb, block, -1),
            ),
        )
        return e.reshape(-1)[:nloc]

    def _fc(self, idx, d, dtype):
        r1 = self.p[idx, self._R1].astype(dtype)
        r2 = self.p[idx, self._R2].astype(dtype)
        x = jnp.clip((d - r1) / jnp.maximum(r2 - r1, 1e-30), 0.0, 1.0)
        return jnp.where(d < r2, 0.5 * (1.0 + jnp.cos(jnp.pi * x)), 0.0)

    def _block_energy(self, r12, t1, t2):
        dtype = r12.dtype
        t = self.num_types
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))  # (B, MN)
        # pair entry (i, j, j)
        ijj = (t1[:, None] * t + t2) * t + t2
        fc12 = self._fc(ijj, d, dtype)
        dsafe = jnp.minimum(d, self.p[ijj, self._R2].astype(dtype))
        fr = self.p[ijj, self._A].astype(dtype) * jnp.exp(
            -self.p[ijj, self._LAM].astype(dtype) * dsafe
        )
        fa = self.p[ijj, self._B].astype(dtype) * jnp.exp(
            -self.p[ijj, self._MU].astype(dtype) * dsafe
        )

        # triple entry (i, j(m), k(slot)) -> (B, MN, MN)
        ijk = (t1[:, None, None] * t + t2[:, :, None]) * t + t2[:, None, :]
        u = r12 / d[..., None]
        cosjk = jnp.einsum("pma,pka->pmk", u, u)
        c2 = self.p[ijk, self._C].astype(dtype) ** 2
        d2 = self.p[ijk, self._D].astype(dtype) ** 2
        hh = self.p[ijk, self._H].astype(dtype)
        gam = self.p[ijk, self._GAMMA].astype(dtype)
        g = gam * (
            1.0 + c2 / d2 - c2 / (d2 + (cosjk - hh) ** 2)
        )
        alpha = self.p[ijk, self._ALPHA].astype(dtype)
        mm = self.p[ijk, self._M].astype(dtype)
        dr = d[:, :, None] - d[:, None, :]
        # clamp dr to keep exp bounded on padded far slots (fc13 = 0 there)
        drc = jnp.clip(dr, -10.0, 10.0)
        e_fac = jnp.where(
            alpha < 1e-10, 1.0,
            jnp.where(mm > 2.0, jnp.exp(alpha * drc**3), jnp.exp(alpha * drc)),
        )
        fc13 = self._fc(ijk, d[:, None, :] * jnp.ones_like(cosjk), dtype)
        not_self = 1.0 - jnp.eye(fc12.shape[-1], dtype=dtype)
        zeta = jnp.einsum("pmk,mk->pm", fc13 * g * e_fac, not_self)

        beta = self.p[ijj, self._BETA].astype(dtype)
        nn = self.p[ijj, self._EN].astype(dtype)
        zeta_ok = zeta > 1e-16
        bzn = jnp.where(
            zeta_ok, (beta * jnp.where(zeta_ok, zeta, 1.0)) ** nn, 0.0
        )
        bij = (1.0 + bzn) ** (-0.5 / nn)
        return jnp.sum(0.5 * fc12 * (fr - bij * fa), axis=-1)

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )


class Tersoff1989(NamedTuple):
    # pair-indexed (T, T)
    a: jnp.ndarray
    b: jnp.ndarray
    lam: jnp.ndarray
    mu: jnp.ndarray
    r1: jnp.ndarray
    r2: jnp.ndarray
    # center-type-indexed (T,)
    beta: jnp.ndarray
    n: jnp.ndarray
    c2: jnp.ndarray
    d2: jnp.ndarray
    h: jnp.ndarray
    rc: float

    @staticmethod
    def from_file(path: str) -> "Tersoff1989":
        with open(path) as f:
            tokens = f.read().split()
        if tokens[0] != "tersoff_1989":
            raise ValueError(f"{path}: not a tersoff_1989 file")
        t = int(tokens[1])
        if t not in (1, 2):
            raise ValueError("tersoff_1989 supports 1 or 2 types")
        vals = [float(x) for x in tokens[2 + t :]]
        rows = [vals[11 * i : 11 * (i + 1)] for i in range(t)]
        chi = vals[11 * t] if t == 2 else 1.0

        def P(i, j, k):  # parameter k of per-type row
            return rows[i][k] if i == j else None

        a = np.zeros((t, t)); b = np.zeros((t, t))
        lam = np.zeros((t, t)); mu = np.zeros((t, t))
        r1 = np.zeros((t, t)); r2 = np.zeros((t, t))
        for i in range(t):
            a[i, i] = rows[i][0]
            b[i, i] = rows[i][1]
            lam[i, i] = rows[i][2]
            mu[i, i] = rows[i][3]
            r1[i, i] = rows[i][9]
            r2[i, i] = rows[i][10]
        if t == 2:
            a[0, 1] = a[1, 0] = np.sqrt(a[0, 0] * a[1, 1])
            b[0, 1] = b[1, 0] = np.sqrt(b[0, 0] * b[1, 1]) * chi
            lam[0, 1] = lam[1, 0] = 0.5 * (lam[0, 0] + lam[1, 1])
            mu[0, 1] = mu[1, 0] = 0.5 * (mu[0, 0] + mu[1, 1])
            r1[0, 1] = r1[1, 0] = np.sqrt(r1[0, 0] * r1[1, 1])
            r2[0, 1] = r2[1, 0] = np.sqrt(r2[0, 0] * r2[1, 1])
        beta = np.array([rows[i][4] for i in range(t)])
        nn = np.array([rows[i][5] for i in range(t)])
        c = np.array([rows[i][6] for i in range(t)])
        d = np.array([rows[i][7] for i in range(t)])
        h = np.array([rows[i][8] for i in range(t)])
        return Tersoff1989(
            a=jnp.asarray(a), b=jnp.asarray(b), lam=jnp.asarray(lam),
            mu=jnp.asarray(mu), r1=jnp.asarray(r1), r2=jnp.asarray(r2),
            beta=jnp.asarray(beta), n=jnp.asarray(nn), c2=jnp.asarray(c * c),
            d2=jnp.asarray(d * d), h=jnp.asarray(h), rc=float(r2.max()),
        )

    # ---- energy --------------------------------------------------------------

    def pair_energies(self, r12, t1, t2, block: int = 2048):
        nloc = r12.shape[0]
        if nloc <= block:
            return self._block_energy(r12, t1, t2)
        blk_fn = jax.checkpoint(self._block_energy)
        nb = -(-nloc // block)
        pad = nb * block - nloc
        r12p = jnp.pad(r12, ((0, pad), (0, 0), (0, 0)), constant_values=1e5)
        t1p = jnp.pad(t1, (0, pad))
        t2p = jnp.pad(t2, ((0, pad), (0, 0)))
        e = jax.lax.map(
            lambda args: blk_fn(*args),
            (
                r12p.reshape(nb, block, *r12.shape[1:]),
                t1p.reshape(nb, block),
                t2p.reshape(nb, block, -1),
            ),
        )
        return e.reshape(-1)[:nloc]

    def _block_energy(self, r12, t1, t2):
        dtype = r12.dtype
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))  # (B, MN)
        tp = (t1[:, None], t2)
        r1p = self.r1[tp].astype(dtype)
        r2p = self.r2[tp].astype(dtype)
        # smooth switch (tersoff fc): 1 below r1, cos ramp to r2
        x = jnp.clip((d - r1p) / jnp.maximum(r2p - r1p, 1e-30), 0.0, 1.0)
        fc = 0.5 * (1.0 + jnp.cos(jnp.pi * x))
        in_range = d < r2p
        fc = jnp.where(in_range, fc, 0.0)

        fr = self.a[tp].astype(dtype) * jnp.exp(
            -self.lam[tp].astype(dtype) * jnp.minimum(d, r2p)
        )
        fa = self.b[tp].astype(dtype) * jnp.exp(
            -self.mu[tp].astype(dtype) * jnp.minimum(d, r2p)
        )

        # zeta_ij = sum_k fc_ik g(cos theta_jik), k != j (same list)
        u = r12 / d[..., None]
        cosjk = jnp.einsum("pma,pka->pmk", u, u)  # (B, MN, MN)
        c2 = self.c2[t1].astype(dtype)[:, None, None]
        d2 = self.d2[t1].astype(dtype)[:, None, None]
        hh = self.h[t1].astype(dtype)[:, None, None]
        g = (1.0 + c2 / d2) - c2 / (d2 + (cosjk - hh) ** 2)
        not_self = 1.0 - jnp.eye(fc.shape[-1], dtype=dtype)
        zeta = jnp.einsum("pk,pmk,mk->pm", fc, g, not_self)

        beta = self.beta[t1].astype(dtype)[:, None]
        nn = self.n[t1].astype(dtype)[:, None]
        # Guard the zeta -> 0 singularity of d(beta zeta)^n/dzeta for n < 1
        # exactly as the reference (b' = 0 for zeta < 1e-16).
        zeta_ok = zeta > 1e-16
        bzn = jnp.where(
            zeta_ok, (beta * jnp.where(zeta_ok, zeta, 1.0)) ** nn, 0.0
        )
        bij = (1.0 + bzn) ** (-0.5 / nn)

        e = 0.5 * fc * (fr - bij * fa)
        return jnp.sum(e, axis=-1)

    @property
    def num_types(self) -> int:
        return self.beta.shape[0]

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )