"""Interlayer potential (ILP) hybrids for layered materials.

TPU-native rebuild of the reference ILP family (ref: src/force/
ilp_tersoff.cu, ilp_nep.cu, ilp_tmd_sw.cu): registry-dependent
Kolmogorov-Crespi-style interlayer terms between layers identified by a
grouping method, combined with an intralayer potential (Tersoff 1988 or
NEP) restricted to same-layer pairs.

The interlayer energy per ordered pair (i -> j, different layers, within
rcut_global, Tap-smoothed):

    E_ij = Tap(r) [ e^{-lambda (r - z0)} (eps/2 + C e^{-rho_ij^2/delta^2})
                    - C6 / (2 r^6 (1 + e^{-d (r/(sR reff)) + d})) ]

where rho_ij^2 = r^2 - (r12 . n_i)^2 uses atom i's LOCAL surface normal
built from its first <= 3 same-layer neighbors within rcut_ilp (cross-
product construction, ref: calc_normal ilp_tersoff.cu:396-660).  Summing
both pair directions reproduces the published symmetric ILP with full eps
and both transverse decays.  The reference hand-derives ~700 lines of
normal-vector gradients; here everything (including dE/dnormal -> atom
positions) flows through ONE vjp of this per-atom energy.

File formats preserved (ref: ilp_tersoff.cu:60-115, ilp_nep.cu:58-160):
`tersoff_ilp`/`nep_ilp` header + group method(s) + T^2 x 12 ILP rows;
tersoff_ilp's second file holds raw T^3 x 14 Tersoff-1988 rows; nep_ilp's
map file assigns a NEP model per layer group.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput, compute_from_pair_energy

# long-range taper polynomial (x = r / rcut_global; ref: Tap_coeff_CBN)
_TAP = np.array([1.0, 0.0, 0.0, 0.0, -35.0, 84.0, -70.0, 20.0])


class ILPTerm(NamedTuple):
    """The interlayer term alone (per-type-pair parameter tables)."""

    z0: jnp.ndarray  # (T, T) beta
    lam: jnp.ndarray  # alpha / beta
    delta2inv: jnp.ndarray
    epsilon: jnp.ndarray  # meV-scaled
    cc: jnp.ndarray  # C, meV-scaled
    d: jnp.ndarray
    d_seff: jnp.ndarray  # d / (sR reff)
    c6: jnp.ndarray  # meV-scaled
    rcutsq_ilp: jnp.ndarray  # normal-neighbor cutoff^2
    rcut_global: jnp.ndarray
    labels: jnp.ndarray  # (N,) layer label per atom
    rc: float

    @staticmethod
    def parse_rows(rows: np.ndarray, t: int, labels) -> "ILPTerm":
        """rows: (T*T, 12) [beta alpha delta eps C d sR reff C6 S
        rcut_ilp rcut_global]."""
        rows = rows.reshape(t, t, 12)
        mev = 1e-3 * rows[..., 9]  # S scale (ref: meV = 1e-3 * S)
        return ILPTerm(
            z0=jnp.asarray(rows[..., 0]),
            lam=jnp.asarray(rows[..., 1] / rows[..., 0]),
            delta2inv=jnp.asarray(1.0 / rows[..., 2] ** 2),
            epsilon=jnp.asarray(rows[..., 3] * mev),
            cc=jnp.asarray(rows[..., 4] * mev),
            d=jnp.asarray(rows[..., 5]),
            d_seff=jnp.asarray(rows[..., 5] / rows[..., 6] / rows[..., 7]),
            c6=jnp.asarray(rows[..., 8] * mev),
            rcutsq_ilp=jnp.asarray(rows[..., 10] ** 2),
            rcut_global=jnp.asarray(rows[..., 11]),
            labels=jnp.asarray(labels, jnp.int32),
            rc=float(rows[..., 11].max()),
        )

    # ---- normals ---------------------------------------------------------

    def _normals(self, r12, same_layer, in_ilp_cut):
        """(N, 3) local surface normal from the first <= 3 same-layer
        neighbors within rcut_ilp (ref: ILP_neighbor + calc_normal)."""
        dtype = r12.dtype
        ok = (same_layer & in_ilp_cut).astype(dtype)  # (N, MN)
        rank = jnp.cumsum(ok, axis=1) * ok  # 1-based among selected
        # vet_k = the k-th selected neighbor vector (k = 1..3)
        vet = jnp.stack(
            [
                jnp.einsum("nm,nmx->nx", (rank == k).astype(dtype) * ok, r12)
                for k in (1.0, 2.0, 3.0)
            ],
            axis=1,
        )  # (N, 3, 3)
        cont = jnp.sum(ok, axis=1)
        cross01 = jnp.cross(vet[:, 0], vet[:, 1])
        cross12 = jnp.cross(vet[:, 1], vet[:, 2])
        cross20 = jnp.cross(vet[:, 2], vet[:, 0])
        n2 = cross01
        n3 = (cross01 + cross12 + cross20) / 3.0
        zhat = jnp.zeros_like(n2).at[:, 2].set(1.0)
        n_raw = jnp.where(
            (cont <= 1)[:, None], zhat,
            jnp.where((cont == 2)[:, None], n2, n3),
        )
        norm = jnp.sqrt(jnp.maximum(jnp.sum(n_raw * n_raw, axis=1), 1e-24))
        return n_raw / norm[:, None]

    # ---- energy ----------------------------------------------------------

    def per_atom_energy(self, r12, t1, t2, nbr_idx, nbr_mask):
        dtype = r12.dtype
        lab1 = self.labels[:, None]
        lab2 = self.labels[jnp.minimum(nbr_idx, self.labels.shape[0] - 1)]
        same = (lab1 == lab2) & (nbr_mask > 0)
        d2 = jnp.sum(r12 * r12, axis=-1)
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))

        def p(tab):
            return tab[t1[:, None], t2].astype(dtype)

        in_ilp = d2 < p(self.rcutsq_ilp)
        normal = self._normals(r12, same, in_ilp)  # (N, 3)

        inter = (~same) & (nbr_mask > 0)
        rcg = p(self.rcut_global)
        x = r / rcg
        tap = jnp.zeros_like(x)
        for k in range(7, -1, -1):
            tap = tap * x + _TAP[k]
        tap = jnp.where(x < 1.0, tap, 0.0)

        prod = jnp.einsum("nx,nmx->nm", normal, r12)
        rho2 = jnp.maximum(d2 - prod * prod, 0.0)
        exp0 = jnp.exp(-p(self.lam) * (r - p(self.z0)))
        exp1 = jnp.exp(-rho2 * p(self.delta2inv))
        e_rep = exp0 * (0.5 * p(self.epsilon) + p(self.cc) * exp1)
        # vdW: half per ordered pair; double() guard of the reference's
        # exp is unnecessary in f32 thanks to the tap gate
        ts = 1.0 + jnp.exp(
            jnp.clip(-p(self.d_seff) * r + p(self.d), -60.0, 60.0)
        )
        e_vdw = -0.5 * p(self.c6) / jnp.maximum(d2 * d2 * d2, 1e-12) / ts
        e_pair = tap * (e_rep + e_vdw)
        e_pair = jnp.where(inter & (x < 1.0), e_pair, 0.0)
        return jnp.sum(e_pair, axis=1)

    def compute(self, type_, nbr: NeighborList, mask,
                per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]

        def energy_fn(r12):
            return self.per_atom_energy(r12, type_, t2, nbr.idx, nbr.mask)

        return compute_from_pair_energy(
            energy_fn, nbr, mask, per_atom_virial=per_atom_virial
        )


_FAR = 1.0e5


class ILPHybrid(NamedTuple):
    """Intralayer potential (same-layer pairs only) + the ILP term."""

    intra: object  # one potential, or a TUPLE of NEPs (per-group nep_ilp)
    ilp: ILPTerm
    rc: float
    # global ILP type index -> intralayer-potential type index (the NEP of
    # a nep_ilp hybrid may cover a subset of the ILP element list,
    # ref: ilp_nep.cu nep map type handling).  For multi-NEP hybrids this
    # is a tuple of per-NEP type maps.
    type_map: Optional[tuple] = None
    # per-atom NEP index (nep_map[group]; ref: ilp_nep.cu:349-375); None
    # for single-intra hybrids
    nep_labels: Optional[jnp.ndarray] = None

    def _intra_single(self, intra, tmap, state, nbr_intra, mask):
        t_intra = state.type
        if tmap is not None:
            t_intra = jnp.asarray(tmap, jnp.int32)[state.type]
        if hasattr(intra, "compute_with_state"):
            return intra.compute_with_state(
                state._replace(type=t_intra, mask=mask), nbr_intra
            )
        return intra.compute(t_intra, nbr_intra, mask)

    def compute_with_state(self, state, nbr: NeighborList) -> PotentialOutput:
        labels = self.ilp.labels
        lab2 = labels[jnp.minimum(nbr.idx, labels.shape[0] - 1)]
        same = (labels[:, None] == lab2) & (nbr.mask > 0)

        def masked_nbr(pair_ok):
            return nbr._replace(
                r12=jnp.where(pair_ok[..., None], nbr.r12, _FAR),
                mask=jnp.where(pair_ok, nbr.mask, 0.0),
            )

        # plain tuple of NEPs (NamedTuple potentials have _fields)
        if isinstance(self.intra, tuple) and not hasattr(
            self.intra, "_fields"
        ):
            # per-group NEPs: atoms whose nep_map[group] == k are evaluated
            # by NEP k on pairs internal to that NEP's atom set
            # (ref: ilp_nep.cu:122-375 nep_map/type_map dispatch)
            nl = self.nep_labels
            nl2 = nl[jnp.minimum(nbr.idx, nl.shape[0] - 1)]
            out_a = None
            for k, (intra, tmap) in enumerate(
                zip(self.intra, self.type_map)
            ):
                pair_ok = same & (nl[:, None] == k) & (nl2 == k)
                m_k = state.mask * (nl == k)
                o = self._intra_single(
                    intra, tmap, state, masked_nbr(pair_ok), m_k
                )
                out_a = o if out_a is None else PotentialOutput(
                    energy=out_a.energy + o.energy,
                    force=out_a.force + o.force,
                    virial=out_a.virial + o.virial,
                )
        else:
            out_a = self._intra_single(
                self.intra, self.type_map, state, masked_nbr(same),
                state.mask,
            )
        out_b = self.ilp.compute(state.type, nbr, state.mask)
        return PotentialOutput(
            energy=out_a.energy + out_b.energy,
            force=out_a.force + out_b.force,
            virial=out_a.virial + out_b.virial,
        )


def _parse_ilp_header(path: str, n_group_ints: int):
    toks = open(path).read().split()
    name = toks[0]
    t = int(toks[1])
    pos = 2 + t  # skip symbols
    gms = [int(toks[pos + i]) for i in range(n_group_ints)]
    pos += n_group_ints
    rows = np.asarray(
        [float(x) for x in toks[pos : pos + t * t * 12]]
    ).reshape(t * t, 12)
    return name, t, gms, rows, toks[pos + t * t * 12 :]


def load_tersoff_ilp(ilp_path: str, tersoff_path: str, labels) -> ILPHybrid:
    """potential tersoff_ilp <ilp_file> <tersoff_file>
    (ref: force.cu:189-195, ilp_tersoff.cu:60-230)."""
    from gpumd_tpu.potentials.tersoff import Tersoff1988

    name, t, gms, rows, _ = _parse_ilp_header(ilp_path, 1)
    ilp = ILPTerm.parse_rows(rows, t, labels)
    # raw headerless T^3 x 14 block (ref: initialize_tersoff_1988)
    vals = np.asarray(
        [float(x) for x in open(tersoff_path).read().split()]
    ).reshape(t * t * t, 14)
    intra = Tersoff1988(
        p=jnp.asarray(vals), num_types=t, rc=float(vals[:, 10].max())
    )
    return ILPHybrid(intra=intra, ilp=ilp, rc=max(ilp.rc, intra.rc)), gms[0]


def load_nep_ilp(ilp_path: str, map_path: str, labels, workdir="."):
    """potential nep_ilp <ilp_file> <nep_map_file>
    (ref: force.cu:182-188, ilp_nep.cu:58-160).

    nep map file: nep_group_method, num_nep, the nep.txt paths, then
    num_nep_group per-group NEP indices (ref: ilp_nep.cu:122-375).
    Returns (hybrid, ilp_group_method, nep_group_method, nep_map);
    for num_nep == 1 nep_group_method is -1 and nep_map is None."""
    import os

    from gpumd_tpu.potentials.nep.model import NEP

    name, t, gms, rows, _ = _parse_ilp_header(ilp_path, 2)
    ilp = ILPTerm.parse_rows(rows, t, labels)
    mtoks = open(map_path).read().split()
    nep_gm = int(mtoks[0])
    num_nep = int(mtoks[1])
    nep_files = mtoks[2 : 2 + num_nep]
    ilp_syms = open(ilp_path).read().split()[2 : 2 + t]

    def load_one(fname):
        p = fname
        if not os.path.isabs(p):
            p = os.path.join(os.path.dirname(map_path), p)
        nep = NEP.from_file(p)
        tmap = tuple(
            nep.model.symbols.index(sym) if sym in nep.model.symbols else 0
            for sym in ilp_syms
        )
        return nep, tmap

    if num_nep == 1:
        intra, tmap = load_one(nep_files[0])
        return ILPHybrid(
            intra=intra, ilp=ilp, rc=max(ilp.rc, intra.rc), type_map=tmap
        ), gms[0], -1, None
    neps, tmaps = zip(*(load_one(f) for f in nep_files))
    rest = mtoks[2 + num_nep :]
    num_groups = int(rest[0])
    nep_map = np.asarray([int(x) for x in rest[1 : 1 + num_groups]],
                         np.int32)
    if (nep_map >= num_nep).any():
        raise ValueError("nep_ilp: group mapped to a nonexistent NEP")
    rc = max([ilp.rc] + [n.rc for n in neps])
    return ILPHybrid(
        intra=tuple(neps), ilp=ilp, rc=rc, type_map=tuple(tmaps),
    ), gms[0], nep_gm, nep_map


def load_sw_ilp(ilp_path: str, sw_path: str, labels) -> tuple:
    """potential sw_ilp <ilp_file> <sw_file>
    (ref: force.cu:196-202, ilp_tmd_sw.cu:40-240)."""
    from gpumd_tpu.potentials.sw import SW

    name, t, gms, rows, _ = _parse_ilp_header(ilp_path, 1)
    ilp = ILPTerm.parse_rows(rows, t, labels)
    vals = [float(x) for x in open(sw_path).read().split()]
    intra = SW.from_tokens(np.asarray(vals), t)
    return ILPHybrid(intra=intra, ilp=ilp, rc=max(ilp.rc, intra.rc)), gms[0]
