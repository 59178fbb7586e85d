"""ForceField: neighbor build + potential dispatch for one MD step.

Plays the role of the reference's `Force` driver (ref: src/force/force.cu:
75-218 parse, 424-631 per-step wrap/zero/dispatch), as a functional object:
`ff(state) -> state` with force / per-atom energy / per-atom virial filled.

Neighbor strategy is chosen once, host-side, from the initial box (small
boxes -> brute force with periodic images; large -> sort-based cell list),
mirroring the reference's small/large-box duality (ref: nep.cu:1356-1389).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
from gpumd_tpu.model.state import MDState
from gpumd_tpu.neighbor.neighbor import (
    NeighborList,
    choose_grid,
    neighbor_brute,
    neighbor_cell_list,
)


@dataclass(frozen=True)
class NeighborConfig:
    rc: float
    mn: int
    method: str  # "brute" | "cell"
    reps: tuple = (0, 0, 0)
    grid: Optional[tuple] = None
    cell_cap: Optional[int] = None

    @staticmethod
    def create(box: Box, rc: float, n_atoms: int, mn: int, skin: float = 0.0):
        """Host-side planning from the initial box (recompiled if box shape
        class changes)."""
        mn += mn & 1  # even MN keeps N*MN pair-sort alignment
        rc_eff = rc + skin
        grid = choose_grid(box, rc_eff)
        if grid is None or n_atoms <= 2048:
            reps = num_replicas_for_cutoff(box, rc_eff)
            return NeighborConfig(rc=rc_eff, mn=mn, method="brute", reps=reps)
        vol_cell = float(box.volume) / (grid[0] * grid[1] * grid[2])
        density = n_atoms / float(box.volume)
        cell_cap = max(8, int(np.ceil(density * vol_cell * 2.0)))
        return NeighborConfig(
            rc=rc_eff, mn=mn, method="cell", grid=grid, cell_cap=cell_cap
        )

    def build(self, position, box: Box, mask) -> NeighborList:
        if self.method == "brute":
            return neighbor_brute(
                position, box, mask, rc=self.rc, mn=self.mn, reps=self.reps
            )
        from gpumd_tpu.neighbor.neighbor import neighbor_cell_dense

        return neighbor_cell_dense(
            position,
            box,
            mask,
            rc=self.rc,
            mn=self.mn,
            grid=self.grid,
            cell_cap=self.cell_cap,
        )


class NeighborCache(NamedTuple):
    """Verlet-list cache: neighbor topology persisted across steps.

    The reference rebuilds its cell list every step (neighbor.cu); here the
    list is built with rc + skin and reused until any atom moves more than
    skin/2 from its reference position — an amortization the static-shape
    design makes nearly free (per-step r12 is one (N, MN) gather).

    `shift_frac` holds the integer lattice-image shift of each pair so the
    displacement r12 = pos[j] - pos[i] + shift @ h^T stays exact without
    re-applying MIC (positions are NOT wrapped between rebuilds).
    """

    idx: jnp.ndarray  # (N, MN) int32
    shift_frac: jnp.ndarray  # (N, MN, 3) int8 lattice-image shifts
    mask: jnp.ndarray  # (N, MN)
    count: jnp.ndarray  # (N,)
    ref_position: jnp.ndarray  # (N, 3) positions at build time
    rev: jnp.ndarray  # (N, MN) int32 reverse-pair map


@dataclass(frozen=True)
class ForceField:
    """One or more potentials evaluated on a shared neighbor plan.

    `potentials` entries must expose .compute(type_, nbr, mask) ->
    PotentialOutput and .rc.
    """

    potentials: tuple
    neighbor: NeighborConfig
    # Per-atom virials (needed by heat-current observables) vs total-only
    # (cheaper; pressure/thermo exact either way).
    per_atom_virial: bool = True
    # Verlet skin (Angstrom): neighbor lists are built at rc + skin and
    # reused until max displacement > skin/2.
    skin: float = 0.0
    # HNEMD driving force Fe (1/A): F_i += W_i^T Fe, with net-force zeroing
    # (ref: force.cu:567-608).  None disables.
    hnemd_fe: Optional[tuple] = None
    # HNEMDEC (Evans-Cummings color/heat flow, ref: force.cu:355-961):
    # mode 0 = heat-flow driving, k > 0 = color driving of species k-1.
    # coef is the flattened per-type coefficient table (2T for mode 0,
    # T for mode > 0), built host-side by hnemdec_coefficients().
    hnemdec_mode: Optional[int] = None
    hnemdec_fe: Optional[tuple] = None
    hnemdec_coef: Optional[tuple] = None
    # Multi-potential 'average' mode (ref: force.cu:514-565): divide the
    # summed properties by the number of potentials.
    average: bool = False

    @staticmethod
    def create(
        potentials,
        box: Box,
        n_atoms: int,
        mn: int = 256,
        skin: float = 0.0,
        per_atom_virial: bool = True,
    ):
        rc = max(p.rc for p in potentials)
        cfg = NeighborConfig.create(box, rc, n_atoms, mn=mn, skin=skin)
        return ForceField(
            potentials=tuple(potentials), neighbor=cfg,
            per_atom_virial=per_atom_virial, skin=skin,
        )

    def compute(self, state: MDState) -> MDState:
        """One-shot evaluation: wrap, rebuild neighbors, evaluate."""
        pos = state.box.wrap(state.position)
        nbr = self.neighbor.build(pos, state.box, state.mask)
        return self._evaluate(state._replace(position=pos), nbr)

    def _evaluate(self, state: MDState, nbr: NeighborList) -> MDState:
        # matmul precision "high" (bf16_3x): TPU's DEFAULT single-pass bf16
        # MXU contractions put ~0.4% relative noise on descriptor/ANN chains
        # and their VJPs, which breaks the NVE drift gate (measured on the
        # compact engine, see engine/nep_compact.py precision note)
        with jax.default_matmul_precision("high"):
            return self._evaluate_prec(state, nbr)

    def _evaluate_prec(self, state: MDState, nbr: NeighborList) -> MDState:
        e = jnp.zeros_like(state.potential_energy)
        f = jnp.zeros_like(state.force)
        w = jnp.zeros_like(state.virial)
        for pot in self.potentials:
            if hasattr(pot, "compute_with_state"):
                out = pot.compute_with_state(state, nbr)
            else:
                out = pot.compute(
                    state.type, nbr, state.mask,
                    per_atom_virial=self.per_atom_virial,
                )
            e = e + out.energy
            f = f + out.force
            w = w + out.virial
        if self.average and len(self.potentials) > 1:
            inv = 1.0 / len(self.potentials)
            e, f, w = e * inv, f * inv, w * inv
        if self.hnemd_fe is not None:
            fe = jnp.asarray(self.hnemd_fe, dtype=f.dtype)
            f = f + jnp.einsum("nba,b->na", w, fe) * state.mask[:, None]
            n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
            f = (f - jnp.sum(f, axis=0) / n_real) * state.mask[:, None]
        elif self.hnemdec_mode is not None:
            fe = jnp.asarray(self.hnemdec_fe, dtype=f.dtype)
            coef = jnp.asarray(self.hnemdec_coef, dtype=f.dtype)
            if self.hnemdec_mode == 0:
                # heat-flow: S_i = E_i I + W_i; f += S^T Fe + per-type terms
                # (ref: force.cu:898-948)
                e_i = (
                    0.5 * state.mass * jnp.sum(state.velocity**2, axis=-1)
                    + e
                )
                s = w + e_i[:, None, None] * jnp.eye(3, dtype=f.dtype)
                s = s * state.mask[:, None, None]
                s_tot = jnp.sum(s, axis=0)
                c1 = coef.reshape(-1, 2)[state.type, 0]
                c2 = coef.reshape(-1, 2)[state.type, 1]
                drive = (
                    jnp.einsum("nba,b->na", s, fe)
                    + c1[:, None] * (s_tot.T @ fe)[None, :]
                    + c2[:, None] * fe[None, :]
                )
                f = f + drive * state.mask[:, None]
            else:
                # color flow: f_i += Fe coef[type_i] (ref: force.cu:750-769)
                f = f + coef[state.type][:, None] * fe[None, :] * state.mask[:, None]
        # Per-atom heat current J_i = W_i . v_i (ref: compute_heat.cu:18-29).
        j = jnp.einsum("nab,nb->na", w, state.velocity)
        return state._replace(
            force=f, potential_energy=e, virial=w, heat_current=j
        )

    def _evaluate_with(self, state: MDState, pot) -> MDState:
        """Evaluate ONE specific potential on a fresh neighbor list
        (dump_observer's per-observer pass, ref: dump_observer.cu)."""
        pos = state.box.wrap(state.position)
        nbr = self.neighbor.build(pos, state.box, state.mask)
        out = pot.compute(state.type, nbr, state.mask)
        j = jnp.einsum("nab,nb->na", out.virial, state.velocity)
        return state._replace(
            position=pos, force=out.force, potential_energy=out.energy,
            virial=out.virial, heat_current=j,
        )

    # ---- Verlet-skin cached path (the hot loop) ------------------------------

    def refresh_cache(self, state: MDState) -> NeighborCache:
        """Full neighbor rebuild -> persistent cache with integer image
        shifts relative to the RAW (unwrapped) positions."""
        pos_raw = state.position
        pos_w = state.box.wrap(pos_raw)
        nbr = self.neighbor.build(pos_w, state.box, state.mask)
        from gpumd_tpu.neighbor.neighbor import build_reverse_map

        # shift = r12 - (raw_j - raw_i), an exact lattice translation.
        from gpumd_tpu.neighbor.neighbor import gather_vec3

        hin = state.box.h_inv.astype(pos_raw.dtype)
        sc = [
            nbr.r12[..., k] - (pos_raw[:, k][nbr.idx] - pos_raw[:, k][:, None])
            for k in range(3)
        ]
        shift_frac = jnp.stack(
            [
                jnp.round(hin[k, 0] * sc[0] + hin[k, 1] * sc[1] + hin[k, 2] * sc[2])
                for k in range(3)
            ],
            axis=-1,
        )
        shift_frac = jnp.where(
            nbr.mask[..., None] > 0, shift_frac, 0.0
        ).astype(jnp.int8)
        rev = build_reverse_map(nbr, shift_frac)
        return NeighborCache(
            idx=nbr.idx,
            shift_frac=shift_frac,
            mask=nbr.mask,
            count=nbr.count,
            ref_position=pos_raw,
            rev=rev,
        )

    def cache_r12(self, state: MDState, cache: NeighborCache) -> NeighborList:
        from gpumd_tpu.neighbor.neighbor import _FAR

        dtype = state.position.dtype
        h = state.box.h.astype(dtype)
        pos = state.position
        valid = cache.mask > 0
        sf = [cache.shift_frac[..., k].astype(dtype) for k in range(3)]
        comps = []
        for k in range(3):
            shift_k = sf[0] * h[k, 0] + sf[1] * h[k, 1] + sf[2] * h[k, 2]
            rk = pos[:, k][cache.idx] - pos[:, k][:, None] + shift_k
            comps.append(jnp.where(valid, rk, _FAR))
        r12 = jnp.stack(comps, axis=-1)
        return NeighborList(
            idx=cache.idx, r12=r12, mask=cache.mask, count=cache.count,
            rev=cache.rev,
        )

    def compute_cached(self, state: MDState, cache: NeighborCache):
        """Force pass with Verlet-list reuse: rebuild only when some atom
        moved more than skin/2 since the cache was built."""
        if self.skin <= 0.0:
            st = self.compute(state)
            return st, cache
        disp = state.box.minimum_image(state.position - cache.ref_position)
        need = jnp.max(jnp.sum(disp * disp, axis=-1)) > (0.5 * self.skin) ** 2
        cache = jax.lax.cond(
            need, lambda s: self.refresh_cache(s), lambda s: cache, state
        )
        nbr = self.cache_r12(state, cache)
        return self._evaluate(state, nbr), cache


def hnemdec_coefficients(mode: int, masses, types, num_types: int):
    """Host-side HNEMDEC coefficient table (ref: force.cu:355-422
    set_hnemdec_parameters).

    mode 0 (heat flow): per type [c1, c2/kBT] pairs with
      c_hv = (M_tot - N m_t) / M_tot, c1 = (c_hv - 1)/N, c2 = kB T c_hv
    -- the kB T factor is applied by the caller (temperature known at parse).
    mode k > 0 (color flow on species k-1): coef[k-1] = N/N_el,
      coef[other] = -N m_other / sum_other(m N).
    Returns (coef_list, mass_type, factor) where factor is the Onsager
    normalization FACTOR (ref: hnemdec_kappa.cu:70-82).
    """
    masses = np.asarray(masses, dtype=float)
    types = np.asarray(types)
    n = len(masses)
    mass_type = np.zeros(num_types)
    type_size = np.zeros(num_types, dtype=int)
    for t in range(num_types):
        sel = types == t
        type_size[t] = sel.sum()
        if type_size[t]:
            mass_type[t] = masses[sel][0]
    total_mass = float(masses.sum())
    if mode == 0:
        coef = np.zeros(num_types * 2)
        for t in range(num_types):
            c_hv = (total_mass - n * mass_type[t]) / total_mass
            coef[2 * t] = (c_hv - 1.0) / n
            coef[2 * t + 1] = c_hv  # x kB T by caller
        factor = 1.0
    else:
        el = mode - 1
        coef = np.zeros(num_types)
        coef[el] = float(n) / max(type_size[el], 1)
        partial_mass = sum(
            mass_type[t] * type_size[t] for t in range(num_types) if t != el
        )
        for t in range(num_types):
            if t != el:
                coef[t] = -n * mass_type[t] / max(partial_mass, 1e-30)
        factor = 1.0 / (
            n * (1.0 / max(partial_mass, 1e-30)
                 + 1.0 / max(type_size[el] * mass_type[el], 1e-30))
        )
    return tuple(coef), tuple(mass_type), factor
