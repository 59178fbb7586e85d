"""Sharded dense-grid NEP MD: 1-D z-slab domain decomposition over a mesh.

TPU-native analog of the reference's NEP_MULTIGPU slab decomposition
(ref: src/force/nep_multigpu.cu:1424-1802): the dense cell grid of
engine/grid.py is sharded along its z (slowest) axis over a
jax.sharding.Mesh; each device owns nz/ndev cell layers and exchanges ONE
ghost cell layer per side per force call via `lax.ppermute` over ICI
(cell width >= rc + skin, so one layer covers the cutoff — the reference
uses 4 half-width cells for the same reach).  In contrast to the
reference's GPU-0-staged scatter/gather, all communication is
neighbor-to-neighbor ring permutes and the integration step runs fully
sharded; there is no global gather in the hot loop.

Atom migration across slab boundaries is handled by the periodic global
re-bin (every `rebin_every` steps, outside the sharded scan) — the Verlet
skin guarantees correctness in between, exactly like the single-chip
dense engine's drift criterion.

Layout: slot arrays reshape to (nz, ny*nx*cap) with z sharded; inside
shard_map every block sees its local (nz_l, ...) slab and the kernels of
nep_dense.py run unmodified on a local plan with grid (nx, ny, nz_l).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpumd_tpu.engine.grid import (
    DenseGridPlan, FAR, apply_perm, bin_dense, fold_ghost_grad, pack_ghost,
    plan_grid,
)
from gpumd_tpu.engine.nep_compact import (
    CompactPlan,
    CompactSpec,
    block_centers,
    build_indices,
    compact_pipeline,
    make_compact_plan,
    pack_block_windows,
    plan_grid_compact,
)
from gpumd_tpu.engine.nep_dense import DenseNepSpec, dense_nep_compute_v2
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import MDState
from gpumd_tpu.potentials.nep.model import NEP

AXIS = "slab"

# Partition axis -> coordinate relabeling: internal column k is global
# column _AXIS_PERM[axis][k], so the chosen global axis becomes the
# internal z that the slab machinery shards (the reference lets the user
# pick the partition direction too, nep_multigpu.cu:1429-1455).  Cyclic
# permutations keep the frame right-handed.
_AXIS_PERM = {"z": (0, 1, 2), "x": (1, 2, 0), "y": (2, 0, 1)}


def _ring_halo(row_lo, row_hi, axis=AXIS):
    """Send my bottom interior row up-ring and top interior row down-ring.

    Returns (ghost_lo, ghost_hi): the rows that belong below/above my slab
    (from my -z / +z neighbors).  Ring wraps periodically."""
    nd = jax.lax.axis_size(axis)
    down = [(i, (i - 1) % nd) for i in range(nd)]  # send to lower neighbor
    up = [(i, (i + 1) % nd) for i in range(nd)]
    # my ghost_lo is the top interior row of my lower neighbor -> they send
    # their row_hi up-ring.
    ghost_lo = jax.lax.ppermute(row_hi, axis, up)
    ghost_hi = jax.lax.ppermute(row_lo, axis, down)
    return ghost_lo, ghost_hi


def _wrap_shift(garr_dtype, box: Box, idx, nd):
    """Lattice z-shift applied at the periodic seam (device 0 / nd-1)."""
    h = box.h.astype(garr_dtype)
    return h[:, 2], idx == 0, idx == nd - 1


def sharded_nep_force(position_slots, type_slots, slot_mask, box: Box,
                      plan_local: DenseGridPlan, model, params,
                      interpret: bool):
    """Force/energy/virial on one z-slab with ppermute ghost exchange.

    Runs INSIDE shard_map: `position_slots` etc. are the local slab's slots
    ((nz_l * ny * nx * cap) rows).  Returns local per-slot outputs and this
    slab's virial contribution (caller psums)."""
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    dtype = position_slots.dtype
    nx, ny, nz_l = plan_local.grid

    # x/y ghosts are intra-slab periodic; z is handled by the ring.
    plan_noz = DenseGridPlan(
        grid=plan_local.grid, cap=plan_local.cap, rc=plan_local.rc,
        skin=plan_local.skin, pbc=(plan_local.pbc[0], plan_local.pbc[1], False),
    )
    garr = pack_ghost(position_slots, type_slots, slot_mask, box, plan_noz)
    # interior boundary rows (z rows 1 and nz_l of the z-padded array)
    row_lo = garr[1]
    row_hi = garr[nz_l]
    ghost_lo, ghost_hi = _ring_halo(row_lo, row_hi)
    hz, at_bottom, at_top = _wrap_shift(dtype, box, idx, nd)
    if plan_local.pbc[2]:
        # seam devices shift the wrapped ghost by one lattice vector
        for k in range(3):
            ghost_lo = ghost_lo.at[:, k].add(
                jnp.where(at_bottom, -hz[k], 0.0)
            )
            ghost_hi = ghost_hi.at[:, k].add(jnp.where(at_top, hz[k], 0.0))
    else:
        far = jnp.full_like(ghost_lo[:, :3], FAR)
        ghost_lo = ghost_lo.at[:, :3].set(
            jnp.where(at_bottom, far, ghost_lo[:, :3])
        )
        ghost_hi = ghost_hi.at[:, :3].set(
            jnp.where(at_top, far, ghost_hi[:, :3])
        )
    garr = garr.at[0].set(ghost_lo).at[nz_l + 1].set(ghost_hi)

    # local fused evaluation, reusing the v2 pipeline pieces on the
    # pre-built ghost array
    from gpumd_tpu.engine import nep_dense as nd_mod
    from gpumd_tpu.engine.grid import fold_candidate_grad, pack_candidates

    spec = DenseNepSpec.from_model(model)
    cap = plan_local.cap
    centers, cand = pack_candidates(
        garr, plan_local, lane_align=nd_mod._chunk_lanes(cap)
    )
    s_cat, a_cat = nd_mod.k1b_call(centers, cand, plan_local, spec, interpret)
    ns = nz_l * ny * nx * cap
    ns_slab = ny * nx * cap
    type_z = type_slots.reshape(nz_l, ns_slab)
    mask_z = slot_mask.reshape(nz_l, ns_slab)

    def slab(z):
        s_z = jax.lax.dynamic_slice_in_dim(s_cat, z, 1, 0)
        a_z = jax.lax.dynamic_slice_in_dim(a_cat, z, 1, 0)
        c_z = jax.lax.dynamic_slice_in_dim(centers, z, 1, 0)
        w_z = jax.lax.dynamic_slice_in_dim(cand, z, 1, 0)
        t_z = jax.lax.dynamic_slice_in_dim(type_z, z, 1, 0).reshape(ns_slab)
        m_z = jax.lax.dynamic_slice_in_dim(mask_z, z, 1, 0).reshape(ns_slab)
        s_flat = s_z.reshape(ns_slab, spec.s_width)
        a_flat = jnp.moveaxis(a_z, 3, 4).reshape(ns_slab, spec.a_width)

        def mid(sf, af):
            e = nd_mod.middle_energy(sf, af, t_z, model, params)
            return e * m_z

        e_slab, vjp_mid = jax.vjp(mid, s_flat, a_flat)
        cot_s, cot_a = vjp_mid(jnp.ones_like(e_slab))
        cot_a6 = jnp.moveaxis(
            cot_a.reshape(1, ny, nx, cap, spec.ch_a, spec.nlm), 4, 3
        )
        plan_z = DenseGridPlan(
            grid=(nx, ny, 1), cap=cap, rc=plan_local.rc,
            skin=plan_local.skin, pbc=plan_local.pbc,
        )
        dcenter_z, dcand_z = nd_mod.k2b_call(
            c_z, w_z,
            cot_s.reshape(1, ny, nx, cap, spec.s_width),
            cot_a6, plan_z, spec, interpret,
        )
        return e_slab, dcenter_z[0], dcand_z[0]

    e_atom, dcenter, dcand = jax.lax.map(slab, jnp.arange(nz_l))
    e_atom = e_atom.reshape(ns)
    dg = fold_candidate_grad(dcand[..., : 27 * cap], plan_local, garr.dtype)
    dc = jnp.moveaxis(dcenter, 2, 3).reshape(nz_l, ny, 3, nx * cap)
    dg = dg.at[1 : 1 + nz_l, 1 : 1 + ny, :, cap : cap + nx * cap].add(dc)

    # total virial from the LOCAL ghost array before returning z cotangents
    # (ghost coordinates carry their shifts, so this is exact after psum)
    w_total = -jnp.einsum("zyax,zybx->ab", garr[:, :, :3], dg)
    w_total = jax.lax.psum(w_total, AXIS)

    # return z-ghost cotangents to their owner slabs: my lo-ghost cotangent
    # is a gradient wrt my LOWER neighbor's top interior layer (and vice
    # versa); the lattice shift is additive so gradients pass unchanged.
    cg_lo = dg[0]
    cg_hi = dg[nz_l + 1]
    nd_ = jax.lax.axis_size(AXIS)
    down = [(i, (i - 1) % nd_) for i in range(nd_)]
    up = [(i, (i + 1) % nd_) for i in range(nd_)]
    add_to_my_top = jax.lax.ppermute(cg_lo, AXIS, down)  # from upper nbr
    add_to_my_bottom = jax.lax.ppermute(cg_hi, AXIS, up)  # from lower nbr
    dg = dg.at[nz_l].add(add_to_my_top)
    dg = dg.at[1].add(add_to_my_bottom)

    # fold x/y ghosts locally; z ghosts already consumed
    force = -fold_ghost_grad(dg, plan_noz) * slot_mask[:, None]
    return e_atom, force, w_total


def _exchange_pos_rows(garr, nz_l, box: Box, pbc_z: bool):
    """Fill the z ghost rows of a position ghost array ((nz_l+2, ny+2, 4,
    lanes), channels x/y/z/type) from the ring neighbors, applying the
    lattice shift at the periodic seam (FAR when the global z is open)."""
    dtype = garr.dtype
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    row_lo = garr[1]
    row_hi = garr[nz_l]
    ghost_lo, ghost_hi = _ring_halo(row_lo, row_hi)
    hz, at_bottom, at_top = _wrap_shift(dtype, box, idx, nd)
    if pbc_z:
        for k in range(3):
            ghost_lo = ghost_lo.at[:, k].add(jnp.where(at_bottom, -hz[k], 0.0))
            ghost_hi = ghost_hi.at[:, k].add(jnp.where(at_top, hz[k], 0.0))
    else:
        far = jnp.full_like(ghost_lo[:, :3], FAR)
        ghost_lo = ghost_lo.at[:, :3].set(
            jnp.where(at_bottom, far, ghost_lo[:, :3]))
        ghost_hi = ghost_hi.at[:, :3].set(
            jnp.where(at_top, far, ghost_hi[:, :3]))
    return garr.at[0].set(ghost_lo).at[nz_l + 1].set(ghost_hi)


def _exchange_val_rows(rows_p, nz_l, pbc_z: bool):
    """Fill the z ghost rows of a shift-invariant VALUES grid (cotangents):
    plain ppermute copies; zero at an open global seam."""
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    lo, hi = _ring_halo(rows_p[1], rows_p[nz_l])
    if not pbc_z:
        at_bottom = idx == 0
        at_top = idx == nd - 1
        lo = jnp.where(at_bottom, jnp.zeros_like(lo), lo)
        hi = jnp.where(at_top, jnp.zeros_like(hi), hi)
    return rows_p.at[0].set(lo).at[nz_l + 1].set(hi)


def _return_ghost_cots(dg, nz_l):
    """Return z ghost-row cotangents to their owner slabs: my lo-ghost
    cotangent is a gradient wrt my LOWER neighbor's top interior row (the
    lattice shift is additive, so gradients pass unchanged)."""
    nd = jax.lax.axis_size(AXIS)
    down = [(i, (i - 1) % nd) for i in range(nd)]
    up = [(i, (i + 1) % nd) for i in range(nd)]
    add_to_my_top = jax.lax.ppermute(dg[0], AXIS, down)  # from upper nbr
    add_to_my_bottom = jax.lax.ppermute(dg[nz_l + 1], AXIS, up)
    return dg.at[nz_l].add(add_to_my_top).at[1].add(add_to_my_bottom)


def sharded_compact_build_idx(position_slots, type_slots, slot_mask,
                              box: Box, cplan_local: CompactPlan,
                              rc_angular: float, pbc_z: bool):
    """Per-slab neighbor-tile build (runs INSIDE shard_map): halo-exchanged
    ghost windows -> distance-sorted index tiles, exactly the single-chip
    build_indices on the local slab.  Returns (idx_local, ok_local)."""
    plan_noz = cplan_local.base
    nz_l = plan_noz.grid[2]
    garr = pack_ghost(position_slots, type_slots, slot_mask, box, plan_noz)
    garr = _exchange_pos_rows(garr, nz_l, box, pbc_z)
    centers = block_centers(garr, cplan_local)
    cand = pack_block_windows(garr, plan_noz, cplan_local.bx, cplan_local.wl)
    return build_indices(centers, cand, cplan_local, rc_angular)


def sharded_compact_force(position_slots, type_slots, slot_mask, box: Box,
                          cplan_local: CompactPlan, idx, model, params,
                          per_atom_virial: bool, interpret: bool,
                          pbc_z: bool, temperature=None):
    """Compact-tile force/energy/virial on one z-slab (INSIDE shard_map).

    This is the PRODUCTION engine per slab — the same K1/middle/K2/scatter
    kernels as single-chip (ref: the multi-GPU path also runs the
    production kernels per slab, src/force/nep_multigpu.cu:1585-1755) —
    with three ring exchanges: position ghost rows in, window-cotangent
    rows in, ghost-row force cotangents back out.  Returns per-slot local
    outputs; the caller psums the total virial."""
    plan_noz = cplan_local.base
    nz_l = plan_noz.grid[2]
    garr = pack_ghost(position_slots, type_slots, slot_mask, box, plan_noz)
    garr = _exchange_pos_rows(garr, nz_l, box, pbc_z)
    out = compact_pipeline(
        garr, type_slots, slot_mask, cplan_local, idx, model, params,
        per_atom_virial=per_atom_virial, interpret=interpret,
        temperature=temperature,
        hook_cot_rows=lambda rows_p: _exchange_val_rows(rows_p, nz_l, pbc_z),
        hook_dghost=lambda dg: _return_ghost_cots(dg, nz_l),
    )
    w_total = jax.lax.psum(out.virial_total, AXIS)
    return out.energy, out.force, w_total, out.virial_atom


class ShardedDenseMD:
    """Multi-chip NEP MD driver: dense grid z-sharded over a 1-D mesh.

    Build once per (box, N, mesh); `run_block` advances `steps_per_block`
    steps fully sharded, then the caller re-bins globally (amortized)."""

    def __init__(self, nep: NEP, box: Box, n_atoms: int, mesh: Mesh,
                 position: Optional[np.ndarray] = None, skin: float = 1.0,
                 cap: Optional[int] = None, interpret: Optional[bool] = None,
                 axis: str = "z", engine: str = "auto",
                 per_atom_virial: bool = False,
                 mn_r: Optional[int] = None, mn_a: Optional[int] = None):
        self.nep = nep
        self.mesh = mesh
        self.ndev = mesh.devices.size
        if axis not in _AXIS_PERM:
            raise ValueError("partition axis must be x, y or z")
        self.axis = axis
        self._perm = np.asarray(_AXIS_PERM[axis])
        self._iperm = np.argsort(self._perm)
        self._box_global = box
        if axis != "z":
            h = np.asarray(box.h, np.float64)
            if not np.allclose(h, np.diag(np.diag(h)), atol=1e-9):
                raise ValueError(
                    "partition axis x/y needs an orthogonal box")
            box = Box.orthogonal(
                np.diag(h)[self._perm],
                pbc=tuple(
                    bool(np.asarray(box.pbc)[i] > 0) for i in self._perm
                ),
                dtype=box.h.dtype,
            )
            if position is not None:
                position = np.asarray(position)[:, self._perm]
        self.box = box  # internal frame (chosen axis relabeled to z)
        if engine == "auto":
            try:
                CompactSpec.from_model(nep.model, nep.params)
                engine = "compact"
            except NotImplementedError:
                engine = "v2"
        self.engine = engine
        self.per_atom_virial = per_atom_virial and engine == "compact"
        self.hnemd_fe: Optional[tuple] = None  # set by the app for HNEMD
        if engine == "compact" and cap is None:
            plan = plan_grid_compact(box, nep.model.rc_radial_max, skin,
                                     n_atoms, position=position)
        else:
            plan = plan_grid(box, nep.model.rc_radial_max, skin, n_atoms,
                             position=position, cap=cap)
        if plan is None:
            raise ValueError("box too thin for the dense engine")
        nx, ny, nz = plan.grid
        # shrink nz to a multiple of ndev (cells get thicker, still >= rc)
        nz = (nz // self.ndev) * self.ndev
        if nz < self.ndev or nz // self.ndev < 1:
            raise ValueError(
                f"cannot split {plan.grid[2]} z-layers over {self.ndev} devices"
            )
        if nz != plan.grid[2]:
            # re-plan with forced nz: recompute cap for the coarser grid
            grid = (plan.grid[0], plan.grid[1], nz)
            if position is not None:
                from gpumd_tpu.engine.grid import _max_occupancy

                occ = _max_occupancy(np.asarray(position), box, grid)
            else:
                occ = n_atoms / (grid[0] * grid[1] * grid[2])
            newcap = max(int(np.ceil(occ * 1.3 / 8.0)) * 8, 8)
            plan = DenseGridPlan(grid=grid, cap=(cap or newcap), rc=plan.rc,
                                 skin=plan.skin, pbc=plan.pbc)
        self.plan = plan
        nz_l = plan.grid[2] // self.ndev
        self.plan_local = DenseGridPlan(
            grid=(plan.grid[0], plan.grid[1], nz_l), cap=plan.cap,
            rc=plan.rc, skin=plan.skin, pbc=plan.pbc,
        )
        self.pbc_z = bool(np.asarray(box.pbc)[2] > 0)
        self.cplan_local: Optional[CompactPlan] = None
        if engine == "compact":
            cplan = make_compact_plan(
                plan, position=position, box=box,
                rc_angular=nep.model.rc_angular_max, mn_r=mn_r, mn_a=mn_a,
            )
            # the slab pipeline handles z through ring halos: the local
            # plan carries pbc_z = False so pack_ghost/fold leave the z
            # ghost rows to the hooks
            plan_noz = DenseGridPlan(
                grid=self.plan_local.grid, cap=plan.cap, rc=plan.rc,
                skin=plan.skin,
                pbc=(plan.pbc[0], plan.pbc[1], False),
            )
            self.cplan_local = CompactPlan(
                base=plan_noz, bx=cplan.bx, mn_r=cplan.mn_r, mn_a=cplan.mn_a,
            )
        self.skin = skin
        self.interpret = interpret
        if self.interpret is None:
            self.interpret = jax.default_backend() != "tpu"
        self.spec = P(AXIS)  # z-major leading axis sharding

    # ---- axis relabeling ----------------------------------------------

    def _relabel(self, state: MDState, perm, box) -> MDState:
        """Permute the coordinate columns of every 3-vector/3x3 field."""
        if self.axis == "z":
            return state
        p = list(perm)
        g = lambda a: None if a is None else a[:, p]
        return state._replace(
            position=g(state.position),
            velocity=g(state.velocity),
            force=g(state.force),
            virial=state.virial[:, p][:, :, p],
            heat_current=g(state.heat_current),
            unwrapped_position=g(state.unwrapped_position),
            box=box,
        )

    def to_global(self, state: MDState) -> MDState:
        """Internal-frame state -> the caller's global frame."""
        return self._relabel(state, self._iperm, self._box_global)

    # ---- global (replicated) rebin -----------------------------------

    def bin_state(self, state: MDState, with_id: bool = False):
        """Input-order state (global frame) -> slot-ordered arrays
        (internal frame, partition-axis-major).  With `with_id`, also
        returns the input-order index of each slot (n for empty slots) so
        callers can restore atom order for dumps."""
        state = self._relabel(state, self._perm, self.box)
        pos_w = state.box.wrap(state.position)
        perm, slot_mask, overflow = bin_dense(
            pos_w, state.box, state.mask, self.plan
        )
        g = lambda a, fill=0.0: apply_perm(a, perm, fill)
        sstate = state._replace(
            position=g(pos_w),
            velocity=g(state.velocity),
            force=g(state.force),
            mass=g(state.mass, 1.0),
            type=g(state.type.astype(jnp.int32), 0),
            potential_energy=g(state.potential_energy),
            virial=g(state.virial),
            heat_current=g(state.heat_current),
            mask=slot_mask,
            unwrapped_position=None,
        )
        if with_id:
            n = state.position.shape[0]
            oid = apply_perm(jnp.arange(n, dtype=jnp.int32), perm, fill=0)
            oid = jnp.where(slot_mask > 0, oid, n)
            return sstate, oid, overflow
        return sstate, overflow

    def gather_input_order(self, sstate: MDState, oid, n: int) -> MDState:
        """Slot-ordered internal-frame state -> input-order global-frame
        snapshot (the inverse of bin_state, for dumps/observables)."""
        oid_np = np.asarray(oid)
        valid = oid_np < n
        inv = np.zeros(n, np.int64)
        inv[oid_np[valid]] = np.nonzero(valid)[0]
        take = lambda a: (
            jnp.asarray(np.asarray(a)[inv]) if a is not None else None
        )
        snap = sstate._replace(
            position=take(sstate.position),
            velocity=take(sstate.velocity),
            force=take(sstate.force),
            mass=take(sstate.mass),
            type=take(sstate.type),
            potential_energy=take(sstate.potential_energy),
            virial=take(sstate.virial),
            heat_current=take(sstate.heat_current),
            mask=take(sstate.mask),
        )
        return self.to_global(snap)

    # ---- sharded step block ------------------------------------------

    def make_block(self, ensemble, dt, steps: int, observer=None):
        """jitted (slot_state, aux) -> (slot_state, aux, ok, ys) advancing
        `steps` steps with the force pass sharded over the mesh.

        Compact engine: the per-slab neighbor-index tiles are built ONCE at
        block entry (shard_mapped build_indices); within the block the
        Verlet skin covers drift, and `ok` goes False if any atom moved
        more than skin/2 from its block-entry position or a neighbor cap
        overflowed — the caller then re-bins globally and retries with a
        shorter block (the reference's multi-GPU path instead re-partitions
        every step, nep_multigpu.cu:1457-1530; amortization is the
        TPU-side replacement)."""
        plan_local = self.plan_local
        model, params = self.nep.model, self.nep.params
        interpret = self.interpret
        nz = self.plan.grid[2]
        mesh = self.mesh
        temperature = getattr(self.nep, "temperature", None)

        if self.engine == "compact":
            cplan_local = self.cplan_local
            rc_a = self.nep.model.rc_angular_max
            pbc_z = self.pbc_z
            per_atom_virial = self.per_atom_virial
            hnemd_fe = self.hnemd_fe

            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
                out_specs=(P(AXIS), P()),
                check_vma=False,
            )
            def sharded_build_idx(pos_z, typ_z, mask_z, box):
                ns_l = pos_z.shape[0] * pos_z.shape[1]
                idx, ok = sharded_compact_build_idx(
                    pos_z.reshape(ns_l, 3), typ_z.reshape(ns_l),
                    mask_z.reshape(ns_l), box, cplan_local, rc_a, pbc_z,
                )
                # idx is (nz_l, ny, nxb, mn_r, a_pad); ok reduced over slabs
                ok_all = jax.lax.pmin(ok.astype(jnp.int32), AXIS) > 0
                return idx, ok_all

            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
                out_specs=(P(AXIS), P(AXIS), P(), P(AXIS)),
                check_vma=False,
            )
            def sharded_force(pos_z, typ_z, mask_z, idx, box):
                ns_l = pos_z.shape[0] * pos_z.shape[1]
                # matmul precision "high": DEFAULT bf16 MXU noise on the
                # descriptor/ANN chain breaks the NVE drift gate
                with jax.default_matmul_precision("high"):
                    e, f, w, w_atom = sharded_compact_force(
                        pos_z.reshape(ns_l, 3), typ_z.reshape(ns_l),
                        mask_z.reshape(ns_l), box, cplan_local, idx,
                        model, params, per_atom_virial, interpret, pbc_z,
                        temperature=temperature,
                    )
                if w_atom is None:
                    w_atom = jnp.zeros((ns_l, 3, 3), f.dtype)
                return (
                    e.reshape(pos_z.shape[0], -1),
                    f.reshape(pos_z.shape[0], -1, 3),
                    w,
                    w_atom.reshape(pos_z.shape[0], -1, 3, 3),
                )

            def compute(state: MDState, idx) -> MDState:
                pos_z = state.position.reshape(nz, -1, 3)
                typ_z = state.type.reshape(nz, -1)
                mask_z = state.mask.reshape(nz, -1)
                e, f, w, w_atom = sharded_force(
                    pos_z, typ_z, mask_z, idx, state.box)
                f = f.reshape(-1, 3)
                n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
                if per_atom_virial:
                    wv = w_atom.reshape(-1, 3, 3) * state.mask[:, None, None]
                else:
                    wv = (w / n_real) * state.mask[:, None, None]
                if hnemd_fe is not None:
                    # homogeneous driving force (ref: force.cu:567-608)
                    fe = jnp.asarray(hnemd_fe, dtype=f.dtype)
                    f = f + jnp.einsum(
                        "nba,b->na", wv, fe,
                        precision=jax.lax.Precision.HIGHEST,
                    ) * state.mask[:, None]
                    f = (f - jnp.sum(f, axis=0) / n_real) * state.mask[:, None]
                j = jnp.sum(wv * state.velocity[:, None, :], axis=2)
                return state._replace(
                    force=f,
                    potential_energy=e.reshape(-1) * state.mask,
                    virial=wv,
                    heat_current=j,
                )

            half_skin_sq = (0.5 * self.plan.skin) ** 2

            def step(carry, _):
                state, aux, idx, ref, ok = carry
                state, aux = ensemble.step1(state, aux, dt)
                disp = state.box.minimum_image(state.position - ref)
                ok = ok & (
                    jnp.max(jnp.sum(disp * disp, -1) * state.mask)
                    <= half_skin_sq
                )
                state = compute(state, idx)
                state, aux = ensemble.step2(state, aux, dt)
                ys = observer(state) if observer is not None else None
                return (state, aux, idx, ref, ok), ys

            def block(state: MDState, aux=None):
                pos_z = state.position.reshape(nz, -1, 3)
                typ_z = state.type.reshape(nz, -1)
                mask_z = state.mask.reshape(nz, -1)
                idx, ok = sharded_build_idx(
                    pos_z, typ_z, mask_z, state.box)
                state = compute(state, idx)
                if aux is None:
                    aux = ensemble.init(state)
                carry = (state, aux, idx, state.position, ok)
                (state, aux, _, _, ok), ys = jax.lax.scan(
                    step, carry, length=steps)
                return state, aux, ok, ys

            def compute_oneshot(state: MDState) -> MDState:
                """Fresh-index single evaluation (old compute signature,
                for snapshots/tests)."""
                pos_z = state.position.reshape(nz, -1, 3)
                typ_z = state.type.reshape(nz, -1)
                mask_z = state.mask.reshape(nz, -1)
                idx, _ = sharded_build_idx(pos_z, typ_z, mask_z, state.box)
                return compute(state, idx)

            return block, compute_oneshot

        def force_fn(pos, typ, mask, box):
            return sharded_nep_force(
                pos, typ, mask, box, plan_local, model, params, interpret
            )

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
            out_specs=(P(AXIS), P(AXIS), P()),
            check_vma=False,
        )
        def sharded_force(pos_z, typ_z, mask_z, box):
            ns_l = pos_z.shape[0] * pos_z.shape[1]
            # matmul precision "high": see compact_nep_compute — DEFAULT
            # bf16 MXU noise on the descriptor/ANN chain breaks the NVE
            # drift gate
            with jax.default_matmul_precision("high"):
                e, f, w = force_fn(
                    pos_z.reshape(ns_l, 3), typ_z.reshape(ns_l),
                    mask_z.reshape(ns_l), box,
                )
            return (
                e.reshape(pos_z.shape[0], -1),
                f.reshape(pos_z.shape[0], -1, 3),
                w,
            )

        def compute(state: MDState) -> MDState:
            pos_z = state.position.reshape(nz, -1, 3)
            typ_z = state.type.reshape(nz, -1)
            mask_z = state.mask.reshape(nz, -1)
            e, f, w = sharded_force(pos_z, typ_z, mask_z, state.box)
            n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
            wv = (w / n_real) * state.mask[:, None, None]
            return state._replace(
                force=f.reshape(-1, 3),
                potential_energy=e.reshape(-1) * state.mask,
                virial=wv,
            )

        def step(carry, _):
            state, aux = carry
            state, aux = ensemble.step1(state, aux, dt)
            state = compute(state)
            state, aux = ensemble.step2(state, aux, dt)
            ys = observer(state) if observer is not None else None
            return (state, aux), ys

        def block(state: MDState, aux=None):
            state = compute(state)
            if aux is None:
                aux = ensemble.init(state)
            (state, aux), ys = jax.lax.scan(step, (state, aux), length=steps)
            return state, aux, jnp.asarray(True), ys

        return block, compute
