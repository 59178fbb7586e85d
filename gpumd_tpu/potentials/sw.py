"""Stillinger-Weber potential (the sw_ilp intralayer model).

TPU-native rebuild of the reference's SW kernels inside the ILP_TMD_SW
hybrid (ref: src/force/ilp_tmd_sw.cu:146-1300):

  2-body: p2 = A_eps exp(1/(r/sigma - a)) (B (sigma/r)^4 - 1),  r < sigma a
  3-body: lambda exp(gamma12/(r12/s12 - a12) + gamma13/(r13/s13 - a13))
                 * dcos^2,   dcos = smooth(cos(theta) - cos0)

with the TMD angular smoothing (dcos tapered to zero over
|dcos| in [0.25, 0.35], ref: ilp_tmd_sw.cuh DELTA1/DELTA2).  Forces and
virials come from one vjp of the per-atom energy instead of the
reference's hand-written partial-force kernels.

File formats (ref: initialize_sw_1985_{1,2,3}): 1 element = one row
[epsilon lambda A B a gamma sigma cos0]; 2/3 elements = per-pair 2-body
rows [A B a sigma gamma] + per-triple rows [lambda cos0].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput, compute_from_pair_energy

_D1, _D2 = 0.25, 0.35  # TMD delta_cos taper window


class SW(NamedTuple):
    a_eps: jnp.ndarray  # (T, T) epsilon*A
    b: jnp.ndarray
    a: jnp.ndarray
    sigma: jnp.ndarray
    gamma: jnp.ndarray
    rc_pair: jnp.ndarray  # sigma * a
    lam: jnp.ndarray  # (T, T, T) epsilon*lambda
    cos0: jnp.ndarray  # (T, T, T)
    num_types: int
    rc: float

    @staticmethod
    def from_tokens(vals, num_types: int) -> "SW":
        t = num_types
        if t == 1:
            eps, lam, aa, bb, a_, gam, sig, c0 = vals[:8]
            a2 = np.full((1, 1), eps * aa)
            b2 = np.full((1, 1), bb)
            aarr = np.full((1, 1), a_)
            sarr = np.full((1, 1), sig)
            garr = np.full((1, 1), gam)
            lam3 = np.full((1, 1, 1), eps * lam)
            c3 = np.full((1, 1, 1), c0)
        elif t == 2:
            # 3 rows [A B a sigma gamma] indexed by n1+n2 (0, 1, 2)
            rows = np.asarray(vals[:15]).reshape(3, 5)
            a2 = np.zeros((2, 2)); b2 = np.zeros((2, 2))
            aarr = np.zeros((2, 2)); sarr = np.zeros((2, 2))
            garr = np.zeros((2, 2))
            for n1 in range(2):
                for n2 in range(2):
                    r = rows[n1 + n2]
                    a2[n1, n2], b2[n1, n2], aarr[n1, n2] = r[0], r[1], r[2]
                    sarr[n1, n2], garr[n1, n2] = r[3], r[4]
            tb = np.asarray(vals[15 : 15 + 16]).reshape(8, 2)
            lam3 = tb[:, 0].reshape(2, 2, 2)
            c3 = tb[:, 1].reshape(2, 2, 2)
        else:
            rows = np.asarray(vals[: t * t * 5]).reshape(t, t, 5)
            a2, b2 = rows[..., 0], rows[..., 1]
            aarr, sarr, garr = rows[..., 2], rows[..., 3], rows[..., 4]
            tb = np.asarray(
                vals[t * t * 5 : t * t * 5 + t**3 * 2]
            ).reshape(t, t, t, 2)
            lam3, c3 = tb[..., 0], tb[..., 1]
        rc_pair = sarr * aarr
        return SW(
            a_eps=jnp.asarray(a2), b=jnp.asarray(b2), a=jnp.asarray(aarr),
            sigma=jnp.asarray(sarr), gamma=jnp.asarray(garr),
            rc_pair=jnp.asarray(rc_pair), lam=jnp.asarray(lam3),
            cos0=jnp.asarray(c3), num_types=t, rc=float(rc_pair.max()),
        )

    @staticmethod
    def from_file(path: str) -> "SW":
        toks = open(path).read().split()
        # headered standalone file: `sw_1985 T syms...`; raw = embedded
        if toks and toks[0] == "sw_1985":
            t = int(toks[1])
            vals = [float(x) for x in toks[2 + t :]]
        else:
            vals = [float(x) for x in toks]
            n = len(vals)
            t = 1 if n == 8 else (2 if n == 31 else 3)
        return SW.from_tokens(vals, t)

    def per_atom_energy(self, r12, t1, t2, nbr_mask):
        dtype = r12.dtype
        d2 = jnp.sum(r12 * r12, axis=-1)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))

        def p2tab(tab):
            return tab[t1[:, None], t2].astype(dtype)

        sig = p2tab(self.sigma)
        a_ = p2tab(self.a)
        rcut = p2tab(self.rc_pair)
        ok = (nbr_mask > 0) & (d < rcut)
        rr = d / sig
        # guarded exponent 1/(r/sigma - a) diverges at the cutoff
        inv = 1.0 / jnp.minimum(rr - a_, -1e-3)
        e2 = p2tab(self.a_eps) * jnp.exp(inv) * (
            p2tab(self.b) / jnp.maximum(rr, 1e-6) ** 4 - 1.0
        )
        e2 = jnp.where(ok, 0.5 * e2, 0.0)

        # 3-body: pairs (m, n) of neighbor slots of each atom
        gam_term = jnp.where(ok, p2tab(self.gamma) * inv, -60.0)
        # cos(theta) between slot m and slot n
        dot = jnp.einsum("nmx,nkx->nmk", r12, r12)
        cosv = dot / jnp.maximum(d[:, :, None] * d[:, None, :], 1e-12)
        t3 = self.lam[t1[:, None, None], t2[:, :, None], t2[:, None, :]].astype(dtype)
        c0 = self.cos0[t1[:, None, None], t2[:, :, None], t2[:, None, :]].astype(dtype)
        dcos = cosv - c0
        adc = jnp.abs(dcos)
        factor = jnp.where(
            adc >= _D2, 0.0,
            jnp.where(
                adc > _D1,
                0.5 + 0.5 * jnp.cos(jnp.pi * (adc - _D1) / (_D2 - _D1)),
                1.0,
            ),
        )
        dcos = dcos * factor
        expf = jnp.exp(
            jnp.clip(gam_term[:, :, None] + gam_term[:, None, :], -60.0, 0.0)
        )
        pair_ok = ok[:, :, None] & ok[:, None, :]
        # exclude m == n (the same neighbor slot)
        mn = jnp.eye(d.shape[1], dtype=bool)[None]
        e3 = jnp.where(
            pair_ok & (~mn), 0.5 * t3 * expf * dcos * dcos, 0.0
        )
        return jnp.sum(e2, axis=1) + jnp.sum(e3, axis=(1, 2))

    def compute(self, type_, nbr: NeighborList, mask,
                per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]

        def energy_fn(r12):
            return self.per_atom_energy(r12, type_, t2, nbr.mask)

        return compute_from_pair_energy(
            energy_fn, nbr, mask, per_atom_virial=per_atom_virial
        )
