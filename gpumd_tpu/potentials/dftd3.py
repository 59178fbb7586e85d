"""DFT-D3 dispersion correction with Becke-Johnson damping.

TPU-native rebuild of the reference DFTD3 (ref: src/force/dftd3.cu:54-212
small-box kernels; the 12.5k-line parameter table dftd3para.cuh:26-104 is
shipped as the binary asset assets/dftd3para.npz — Grimme's published D3
reference data: num_cn / cn_ref / r2r4 / covalent radii / triangular-pair
C6(CN_i, CN_j) table).

The whole correction is ONE differentiable per-atom energy of the
displacement rows:

  CN_i   = sum_j 1 / (1 + exp(-16 (R_cov,ij / d - 1)))     (d < rc_cn)
  C6_ij  = sum_kl c6ref_ij,kl L_kl / sum_kl L_kl,
           L_kl = exp(-4 ((CN_i - cnref_ik)^2 + (CN_j - cnref_jl)^2))
  E_i    = -1/2 sum_j [ s6 C6 / (d^6 + R0^6) + s8 C8 / (d^8 + R0^8) ],
           R0 = a1 sqrt(C8/C6) + a2,  C8 = 3 r2r4_i r2r4_j Bohr^2 C6

so forces (including the CN chain the reference handles with dc6_sum /
dc8_sum extra kernels) come from a single vjp.

run.in: `dftd3 <functional> rc_potential rc_cn` (the reference parses this
from within the NEP constructor, nep.cu:45-73; here it is a first-class
keyword that attaches a DFTD3 term to the force field).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput, compute_from_pair_energy

BOHR = 0.5291772575069165
BOHR2 = 0.280028569862541
HARTREE_BOHR6 = 0.597527426643772
_MAX_CN = 5

# (s6, a1, s8, a2) per functional, BJ damping (ref: dftd3.cu:1112-1166)
FUNCTIONALS = {
    "b1b95": (1.000, 0.2092, 1.4507, 5.5545),
    "b2gpplyp": (0.560, 0.0000, 0.2597, 6.3332),
    "b2plyp": (0.640, 0.3065, 0.9147, 5.0570),
    "b3lyp": (1.000, 0.3981, 1.9889, 4.4211),
    "b3pw91": (1.000, 0.4312, 2.8524, 4.4693),
    "b97d": (1.000, 0.5545, 2.2609, 3.2297),
    "bhlyp": (1.000, 0.2793, 1.0354, 4.9615),
    "blyp": (1.000, 0.4298, 2.6996, 4.2359),
    "bmk": (1.000, 0.1940, 2.0860, 5.9197),
    "bop": (1.000, 0.4870, 3.295, 3.5043),
    "bp86": (1.000, 0.3946, 3.2822, 4.8516),
    "bpbe": (1.000, 0.4567, 4.0728, 4.3908),
    "camb3lyp": (1.000, 0.3708, 2.0674, 5.4743),
    "dsdblyp": (0.500, 0.0000, 0.2130, 6.0519),
    "hcth120": (1.000, 0.3563, 1.0821, 4.3359),
    "hf": (1.000, 0.3385, 0.9171, 2.883),
    "hse-hjs": (1.000, 0.3830, 2.3100, 5.685),
    "lc-wpbe08": (1.000, 0.3919, 1.8541, 5.0897),
    "lcwpbe": (1.000, 0.3919, 1.8541, 5.0897),
    "m11": (1.000, 0.0000, 2.8112, 10.1389),
    "mn12l": (1.000, 0.0000, 2.2674, 9.1494),
    "mn12sx": (1.000, 0.0983, 1.1674, 8.0259),
    "mpw1b95": (1.000, 0.1955, 1.0508, 6.4177),
    "mpwb1k": (1.000, 0.1474, 0.9499, 6.6223),
    "mpwlyp": (1.000, 0.4831, 2.0077, 4.5323),
    "n12sx": (1.000, 0.3283, 2.4900, 5.7898),
    "olyp": (1.000, 0.5299, 2.6205, 2.8065),
    "opbe": (1.000, 0.5512, 3.3816, 2.9444),
    "otpss": (1.000, 0.4634, 2.7495, 4.3153),
    "pbe": (1.000, 0.4289, 0.7875, 4.4407),
    "pbe0": (1.000, 0.4145, 1.2177, 4.8593),
    "pbe38": (1.000, 0.3995, 1.4623, 5.1405),
    "pbesol": (1.000, 0.4466, 2.9491, 6.1742),
    "ptpss": (0.750, 0.000, 0.2804, 6.5745),
    "pw6b95": (1.000, 0.2076, 0.7257, 6.375),
    "pwb6k": (1.000, 0.1805, 0.9383, 7.7627),
    "pwpb95": (0.820, 0.0000, 0.2904, 7.3141),
    "revpbe": (1.000, 0.5238, 2.3550, 3.5016),
    "revpbe0": (1.000, 0.4679, 1.7588, 3.7619),
    "revpbe38": (1.000, 0.4309, 1.4760, 3.9446),
    "revssb": (1.000, 0.4720, 0.4389, 4.0986),
    "rpbe": (1.000, 0.1820, 0.8318, 4.0094),
    "rpw86pbe": (1.000, 0.4613, 1.3845, 4.5062),
    "scan": (1.000, 0.5380, 0.0000, 5.42),
    "sogga11x": (1.000, 0.1330, 1.1426, 5.7381),
    "ssb": (1.000, -0.0952, -0.1744, 5.2170),
    "tpss": (1.000, 0.4535, 1.9435, 4.4752),
    "tpss0": (1.000, 0.3768, 1.2576, 4.5865),
    "tpssh": (1.000, 0.4529, 2.2382, 4.6550),
    "b2kplyp": (0.64, 0.0000, 0.1521, 7.1916),
    "dsd-pbep86": (0.418, 0.0000, 0.0000, 5.6500),
    "b97m": (1.0000, -0.0780, 0.1384, 5.5946),
    "wb97x": (1.0000, 0.0000, 0.2641, 5.4959),
    "wb97m": (1.0000, 0.5660, 0.3908, 3.1280),
}


def _load_tables():
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "dftd3para.npz")
    return np.load(path)


class DFTD3(NamedTuple):
    """D3(BJ) dispersion term; combines with any base potential."""

    s6: float
    a1: float
    s8: float
    a2: float
    z_of_type: Tuple[int, ...]  # 0-based atomic index (Z - 1) per type
    rc_radial: float = 15.0
    rc_cn: float = 10.0
    # tables (pytree leaves)
    num_cn: jnp.ndarray = None  # (94,)
    cn_ref: jnp.ndarray = None  # (94, 5); unused slots parked far away
    r2r4: jnp.ndarray = None
    rcov: jnp.ndarray = None
    c6_pair: jnp.ndarray = None  # (94, 94, 5, 5) symmetrized from triangle

    @property
    def rc(self) -> float:
        return self.rc_radial

    @staticmethod
    def create(functional: str, rc_radial: float, rc_cn: float,
               symbols) -> "DFTD3":
        from gpumd_tpu.elements import atomic_number

        fn = functional.lower()
        if fn not in FUNCTIONALS:
            raise ValueError(
                f"functional {functional!r} not supported for DFT-D3 (BJ)"
            )
        s6, a1, s8, a2 = FUNCTIONALS[fn]
        tab = _load_tables()
        num_cn = tab["num_cn"]
        cn_ref = tab["cn_ref"].copy()
        # park unused CN slots so their Gaussian weight underflows to 0
        for z in range(94):
            cn_ref[z, num_cn[z]:] = 1.0e3
        # expand the triangular pair table to (94, 94, 5, 5):
        # pair (zs <= zl) stored at z12 = zs*94 - zs(zs-1)/2 + (zl - zs),
        # entry (i, j) ordered by (z1 < z2) ? (i, j) : (j, i)
        c6_flat = tab["c6_ref"].reshape(-1, _MAX_CN, _MAX_CN)
        c6 = np.zeros((94, 94, _MAX_CN, _MAX_CN), np.float32)
        for zs in range(94):
            base = zs * 94 - (zs * (zs - 1)) // 2 - zs
            for zl in range(zs, 94):
                blk = c6_flat[base + zl]
                c6[zs, zl] = blk
                c6[zl, zs] = blk.T
        return DFTD3(
            s6=s6, a1=a1, s8=s8, a2=a2,
            z_of_type=tuple(atomic_number(s) - 1 for s in symbols),
            rc_radial=rc_radial, rc_cn=rc_cn,
            num_cn=jnp.asarray(num_cn),
            cn_ref=jnp.asarray(cn_ref),
            r2r4=jnp.asarray(tab["r2r4"]),
            rcov=jnp.asarray(tab["covalent_radius"]),
            c6_pair=jnp.asarray(c6),
        )

    def per_atom_energy(self, r12, z1, z2, nbr_idx, nbr_mask):
        """Per-atom D3 energies; differentiable in r12 (CN chain included)."""
        dtype = r12.dtype
        d2 = jnp.sum(r12 * r12, axis=-1)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        ok = nbr_mask > 0

        # coordination numbers (rc_cn cutoff)
        rcov_sum = BOHR * (self.rcov[z1][:, None] + self.rcov[z2]).astype(dtype)
        cn_term = 1.0 / (jnp.exp(-16.0 * (rcov_sum / d - 1.0)) + 1.0)
        cn = jnp.sum(jnp.where(ok & (d < self.rc_cn), cn_term, 0.0), axis=1)

        # C6(CN_i, CN_j) Gaussian interpolation
        cn_i = cn[:, None]  # (N, 1)
        cn_j = cn[nbr_idx]  # (N, MN)
        ref_i = self.cn_ref[z1].astype(dtype)  # (N, 5)
        ref_j = self.cn_ref[z2].astype(dtype)  # (N, MN, 5)
        di = cn_i[..., None] - ref_i[:, None, :]  # (N, 1->MN?, 5)
        di = jnp.broadcast_to(di, (d.shape[0], d.shape[1], _MAX_CN))
        dj = cn_j[..., None] - ref_j
        L = jnp.exp(
            -4.0 * (di[..., :, None] ** 2 + dj[..., None, :] ** 2)
        )  # (N, MN, 5, 5)
        c6_ref_ij = self.c6_pair[z1[:, None], z2].astype(dtype)  # (N,MN,5,5)
        w = jnp.sum(L, axis=(-2, -1))
        zsum = jnp.sum(c6_ref_ij * L, axis=(-2, -1))
        # W-underflow fallback: the largest-CN reference entry
        last_i = self.num_cn[z1][:, None] - 1
        last_j = self.num_cn[z2] - 1
        c6_last = c6_ref_ij[
            jnp.arange(d.shape[0])[:, None],
            jnp.arange(d.shape[1])[None, :], last_i, last_j,
        ]
        c6 = jnp.where(w < 1e-30, c6_last, zsum / jnp.maximum(w, 1e-30))
        c6 = c6 * HARTREE_BOHR6

        c8_over_c6 = (
            3.0 * (self.r2r4[z1][:, None] * self.r2r4[z2]).astype(dtype)
            * BOHR2
        )
        c8 = c6 * c8_over_c6
        damp = self.a1 * jnp.sqrt(c8_over_c6) + self.a2
        d6 = d2 * d2 * d2
        d8 = d6 * d2
        e_pair = -(
            self.s6 * c6 / (d6 + damp**6) + self.s8 * c8 / (d8 + damp**8)
        ) * 0.5
        e_pair = jnp.where(ok & (d < self.rc_radial), e_pair, 0.0)
        return jnp.sum(e_pair, axis=1)

    def compute(self, type_, nbr: NeighborList, mask,
                per_atom_virial=True) -> PotentialOutput:
        z_map = jnp.asarray(self.z_of_type, jnp.int32)
        z1 = z_map[type_]
        z2 = z_map[type_[nbr.idx]]

        def energy_fn(r12):
            return self.per_atom_energy(r12, z1, z2, nbr.idx, nbr.mask)

        return compute_from_pair_energy(
            energy_fn, nbr, mask, per_atom_virial=per_atom_virial
        )
