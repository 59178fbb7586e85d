"""Dense cell-grid state layout for the fused MD engine.

TPU-native redesign of the reference's cell list + neighbor list
(ref: src/force/neighbor.cu:42-220): instead of compacting neighbors into a
padded (N, MN) index matrix (whose per-step gathers are the TPU wall), atoms
LIVE in a dense (nz, ny, nx, cap) cell grid between occasional re-sorts.
Every hot-loop memory access then becomes a static window slice:

  * pair candidates of cell (z, y, x) = the 27 adjacent cells, i.e. a
    contiguous (3, 3, 3*cap) window of a ghost-padded grid -> regular DMA,
    no gathers at all;
  * "neighbor list rebuild" degenerates to a re-sort of atoms by cell id
    when any atom has drifted more than skin/2 (Verlet criterion), instead
    of the reference's per-step rebuild;
  * periodic boundaries are one layer of ghost cells whose positions carry
    the exact lattice shift (ref small-box ExpandedBox semantics,
    nep.cu:1141+, generalized to the bulk path).

Layout notes (TPU): all per-slot arrays are kept as separate x/y/z
components with the flattened (nx*cap) axis minor, so the wide dimension is
the 128-lane axis and no (..., 3) minor-dim padding blowups occur.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box

FAR = 1.0e5


@dataclass(frozen=True)
class DenseGridPlan:
    """Static (jit-time) description of the dense cell grid."""

    grid: Tuple[int, int, int]  # (nx, ny, nz) cells
    cap: int  # slots per cell
    rc: float  # interaction cutoff the stencil must cover
    skin: float  # Verlet skin: rebin when max drift > skin/2
    pbc: Tuple[bool, bool, bool]

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.grid
        return nx * ny * nz

    @property
    def n_slots(self) -> int:
        return self.n_cells * self.cap

    @property
    def row_lanes(self) -> int:
        """Lane count of one interior x-row: nx * cap."""
        return self.grid[0] * self.cap

    @property
    def ghost_row_lanes(self) -> int:
        """Lane count of one ghost-padded x-row: (nx + 2) * cap."""
        return (self.grid[0] + 2) * self.cap


def plan_grid(
    box: Box,
    rc: float,
    skin: float,
    n_atoms: int,
    position: Optional[np.ndarray] = None,
    cap: Optional[int] = None,
    cap_margin: float = 1.3,
) -> Optional[DenseGridPlan]:
    """Host-side planning: cell counts and per-cell capacity.

    Cells are fractional slabs of the box, at least (rc + skin) thick in
    Cartesian space so the 3^3 stencil covers the cutoff sphere (same
    geometric requirement as the reference cell list with >=3 bins,
    ref: neighbor.cu:316-320 scaled to full-cutoff cells).
    Returns None when the box is too thin for the dense path.
    """
    t = np.asarray(box.thickness(), dtype=np.float64)
    w = rc + skin
    pbc_np = np.asarray(box.pbc) > 0
    grid = []
    for d in range(3):
        nd = int(np.floor(float(t[d]) / w))
        if pbc_np[d]:
            if nd < 3:
                return None
        else:
            # non-periodic: FAR ghost layers replace wrap images, so one
            # cell suffices even when the extent is below rc+skin (thin
            # sheets: BASELINE config 4's graphene, Lz = 3.35 A); with
            # nd >= 2 each cell is >= rc+skin so the 3-cell stencil still
            # covers the cutoff sphere
            nd = max(nd, 1)
        grid.append(nd)
    grid = tuple(grid)
    if cap is None:
        if position is None:
            density = n_atoms / float(box.volume)
            vol_cell = float(box.volume) / (grid[0] * grid[1] * grid[2])
            occ = density * vol_cell
        else:
            occ = _max_occupancy(np.asarray(position), box, grid)
        cap = int(np.ceil(occ * cap_margin / 8.0)) * 8
        cap = max(cap, 8)
    pbc = tuple(bool(p) for p in np.asarray(box.pbc) > 0)
    return DenseGridPlan(grid=grid, cap=cap, rc=rc, skin=skin, pbc=pbc)


def _max_occupancy(position: np.ndarray, box: Box, grid) -> int:
    """Worst-case cell occupancy over BOTH float32 and float64 binning.

    Lattice positions often sit exactly on cell boundaries; whole planes of
    atoms then flip cells between the planner's host arithmetic and the
    device's (f32) cell_ids, so a single-precision estimate can undercount
    what binning actually sees (round-3: cap overflow at 262k/1M)."""
    nx, ny, nz = grid
    worst = 0
    for dt in (np.float64, np.float32):
        hinv = np.asarray(box.h_inv, dtype=dt)
        s = position.astype(dt) @ hinv.T
        s = s - np.floor(s)
        idx = np.minimum(
            np.floor(s * np.asarray(grid, dt)).astype(np.int64),
            np.asarray(grid) - 1,
        )
        cid = (idx[:, 2] * ny + idx[:, 1]) * nx + idx[:, 0]
        worst = max(worst, int(np.bincount(cid, minlength=nx * ny * nz).max()))
    return worst


def cell_ids(position, box: Box, mask, plan: DenseGridPlan):
    """(N,) int32 cell id per atom (padding atoms -> virtual overflow cell).

    Fractional coords via the box's elementwise matvec — a (N,3)@(3,3)
    matmul runs on the MXU at reduced effective precision (round-3: ~0.1 A
    coordinate error scattered whole boundary planes across cells)."""
    nx, ny, nz = plan.grid
    dtype = position.dtype
    s = box.fractional(position.astype(dtype))
    # wrap periodic dims; CLIP non-periodic dims (an atom drifting past a
    # free boundary must bin into the end cell, not teleport across)
    pbc_col = jnp.asarray([1.0 if p else 0.0 for p in plan.pbc], dtype)
    s = jnp.where(pbc_col > 0, s - jnp.floor(s),
                  jnp.clip(s, 0.0, 1.0 - 1e-7))
    gridf = jnp.asarray([nx, ny, nz], dtype)
    cxyz = jnp.clip(
        jnp.floor(s * gridf).astype(jnp.int32),
        0,
        jnp.asarray([nx - 1, ny - 1, nz - 1]),
    )
    cid = (cxyz[:, 2] * ny + cxyz[:, 1]) * nx + cxyz[:, 0]
    return jnp.where(mask > 0, cid, plan.n_cells)


def bin_dense(position, box: Box, mask, plan: DenseGridPlan):
    """Sort atoms into the dense slot layout.

    Args:
      position: (R, 3) rows (R = N or N_slots when re-binning slot state).
      mask: (R,) 1.0 for real atoms.
    Returns:
      perm: (n_slots,) int32 — row index feeding each slot; empty slots point
        at row R (callers append one pad row before gathering).
      slot_mask: (n_slots,) occupancy.
      overflow: scalar bool — some cell exceeded cap (slots are DROPPED;
        callers must treat this like the reference's neighbor-overflow abort).
    """
    r = position.shape[0]
    cid = cell_ids(position, box, mask, plan)
    order = jnp.argsort(cid)  # stable radix sort in XLA
    sorted_cid = cid[order]
    starts = jnp.searchsorted(sorted_cid, jnp.arange(plan.n_cells + 1))
    rank = jnp.arange(r, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_cid, plan.n_cells)
    ].astype(jnp.int32)
    occ = (starts[1:] - starts[:-1]).astype(jnp.int32)
    overflow = jnp.any(occ > plan.cap)

    dest = sorted_cid * plan.cap + jnp.minimum(rank, plan.cap - 1)
    ok = (rank < plan.cap) & (sorted_cid < plan.n_cells)
    dest = jnp.where(ok, dest, plan.n_slots)  # dropped -> sink
    perm = jnp.full((plan.n_slots + 1,), r, jnp.int32)
    perm = perm.at[dest].set(order.astype(jnp.int32), mode="drop")[: plan.n_slots]
    slot_mask = jnp.zeros((plan.n_slots + 1,), position.dtype)
    slot_mask = slot_mask.at[dest].set(1.0, mode="drop")[: plan.n_slots]
    return perm, slot_mask, overflow


def apply_perm(arr, perm, fill=0.0):
    """Gather rows of `arr` into slot order; out-of-range perm rows -> fill."""
    pad_row = jnp.full((1,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, pad_row], axis=0)[perm]


def pack_ghost(position_slots, type_slots, slot_mask, box: Box,
               plan: DenseGridPlan):
    """Dense slot state -> ghost-padded (nzg, nyg, 4, (nx+2)*cap) f-array.

    The channel axis sits at -2 so Pallas can block single (z, y) rows (the
    TPU lowering requires the last two block dims be full-size or 8/128-
    aligned; leading dims may be blocked freely).

    Channels: x, y, z (Cartesian, ghosts carry the exact lattice shift) and
    type (as float). Empty slots are parked at FAR so distance masks kill
    them with no explicit mask channel; non-periodic ghost layers are FAR.
    (The f32-rounded shift makes boundary-pair displacements antisymmetric
    only to ~ulp(L); an exact-MIC-on-raw-coordinates variant was prototyped
    in round 3 but the measured drift came from matmul precision instead —
    see compact_nep_compute.)
    """
    nx, ny, nz = plan.grid
    cap = plan.cap
    dtype = position_slots.dtype
    h = box.h.astype(dtype)

    pos = jnp.where(slot_mask[:, None] > 0, position_slots, FAR)
    t = jnp.where(slot_mask > 0, type_slots.astype(dtype), -1.0)
    comps = [pos[:, k].reshape(nz, ny, nx * cap) for k in range(3)]
    comps.append(t.reshape(nz, ny, nx * cap))

    def pad_axis(arrs, axis, shift_col, periodic):
        """Ghost-pad one grid axis (axis: 0=z, 1=y, 2=x-cells)."""
        out = []
        for k, a in enumerate(arrs):
            shift = shift_col[k] if k < 3 else 0.0
            if axis == 2:  # x: slice cap-sized lane groups
                lo, hi = a[..., -cap:], a[..., :cap]
            else:
                ax = axis
                lo = jax.lax.slice_in_dim(a, a.shape[ax] - 1, a.shape[ax], axis=ax)
                hi = jax.lax.slice_in_dim(a, 0, 1, axis=ax)
            if periodic:
                lo, hi = lo + shift, hi - shift
            else:
                lo = jnp.full_like(lo, FAR if k < 3 else -1.0)
                hi = jnp.full_like(hi, FAR if k < 3 else -1.0)
            out.append(jnp.concatenate([lo, a, hi], axis=2 if axis == 2 else axis))
        return out

    # order: x (lanes), then y, then z — corner ghosts compose shifts exactly
    comps = pad_axis(comps, 2, -h[:, 0], plan.pbc[0])
    comps = pad_axis(comps, 1, -h[:, 1], plan.pbc[1])
    comps = pad_axis(comps, 0, -h[:, 2], plan.pbc[2])
    return jnp.stack(comps, axis=2)  # (nz+2, ny+2, 4, (nx+2)*cap)


def fold_ghost_grad(dg, plan: DenseGridPlan):
    """Adjoint of pack_ghost on the position channels: fold ghost-layer
    cotangents back onto their interior source cells (the lattice shift is
    additive, so gradients pass through unchanged).

    dg: (nz+2, ny+2, 3, (nx+2)*cap) -> (n_slots, 3).
    """
    cap = plan.cap
    # reverse order of pack_ghost: z, then y, then x — each fold consumes
    # the PREVIOUS fold's result so corner-ghost contributions compose.
    g = dg
    core = g[1:-1] + 0.0
    if plan.pbc[2]:
        core = core.at[-1].add(g[0])
        core = core.at[0].add(g[-1])
    g = core
    core = g[:, 1:-1] + 0.0
    if plan.pbc[1]:
        core = core.at[:, -1].add(g[:, 0])
        core = core.at[:, 0].add(g[:, -1])
    g = core
    inner = g[..., cap:-cap] + 0.0
    if plan.pbc[0]:
        inner = inner.at[..., -cap:].add(g[..., :cap])
        inner = inner.at[..., :cap].add(g[..., -cap:])
    # (nz, ny, 3, nx*cap) -> (n_slots, 3)
    return jnp.moveaxis(inner, 2, 0).reshape(3, -1).T


def round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def pack_candidates(garr, plan: DenseGridPlan, lane_align: int = 128):
    """Ghost-padded grid -> per-cell packed candidate array.

    garr: (nz+2, ny+2, 4, (nx+2)*cap) from pack_ghost.
    Returns (nz, ny, nx, 4, C) where lanes 27*cap candidates of each cell's
    3^3 window sit contiguously (C = 27*cap rounded up to `lane_align`),
    padding parked at FAR.

    This is pure XLA slicing/concat — regular DMA, no gathers — rebuilt
    every step from current positions.  It exists so the Pallas kernels see
    ONE lane-aligned candidate block per cell: Mosaic compile time explodes
    on lane-misaligned window slices (the v1 kernels sliced a (4, 3cap)
    window at cap-grain offsets; cap=88 took 2+ minutes per tile-math
    instance to compile), while aligned full-block refs compile in seconds.
    """
    nx, ny, nz = plan.grid
    cap = plan.cap
    nxg = nx + 2
    g5 = garr.reshape(garr.shape[0], garr.shape[1], 4, nxg, cap)
    g5 = jnp.moveaxis(g5, 3, 2)  # (nz+2, ny+2, nx+2, 4, cap)
    chunks = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                chunks.append(
                    g5[dz : dz + nz, dy : dy + ny, dx : dx + nx]
                )
    cand = jnp.concatenate(chunks, axis=-1)  # (nz, ny, nx, 4, 27*cap)
    c_pad = round_up(27 * cap, lane_align)
    if c_pad > 27 * cap:
        pad = jnp.full(
            cand.shape[:-1] + (c_pad - 27 * cap,), FAR, cand.dtype
        )
        # type channel pad must be -1 (parked), not FAR
        pad = pad.at[..., 3, :].set(-1.0)
        cand = jnp.concatenate([cand, pad], axis=-1)
    centers = g5[1 : 1 + nz, 1 : 1 + ny, 1 : 1 + nx]  # (nz, ny, nx, 4, cap)
    return centers, cand


def pack_ghost_rows(rows, plan: DenseGridPlan, fill=0.0):
    """Ghost-pad a row-grid VALUES array (nz, ny, C, nx*cap) ->
    (nz+2, ny+2, C, (nx+2)*cap), for quantities invariant under the periodic
    lattice shift (cotangents, charges): periodic ghost layers carry plain
    copies; non-periodic ghost layers are `fill`."""
    cap = plan.cap

    def pad(a, axis, periodic):
        if axis == 3:
            lo, hi = a[..., -cap:], a[..., :cap]
        else:
            lo = jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis],
                                      axis=axis)
            hi = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        if not periodic:
            lo = jnp.full_like(lo, fill)
            hi = jnp.full_like(hi, fill)
        return jnp.concatenate([lo, a, hi], axis=axis)

    rows = pad(rows, 3, plan.pbc[0])
    rows = pad(rows, 1, plan.pbc[1])
    rows = pad(rows, 0, plan.pbc[2])
    return rows


def pack_ghost_vals(vals, plan: DenseGridPlan, fill=0.0):
    """Slot-ordered per-atom VALUES (n_slots, C) -> ghost-padded grid
    (nz+2, ny+2, C, (nx+2)*cap) (see pack_ghost_rows)."""
    nx, ny, nz = plan.grid
    cap = plan.cap
    c = vals.shape[1]
    rows = jnp.moveaxis(
        vals.reshape(nz, ny, nx * cap, c), 3, 2
    )
    return pack_ghost_rows(rows, plan, fill)


def pack_block_windows(g, plan: DenseGridPlan, bx: int, wl: int,
                       far_channels=3):
    """Ghost grid (nzg, nyg, C, nxg*cap) -> per-x-block candidate windows
    (nz_out, ny, nxb, C, wl) where nz_out = nzg - 2.

    Window lanes: cells (dz, dy, wx) for dz, dy in 0..2 and wx in 0..bx+1,
    cell-major in that order, cap lanes each; padded to `wl` with FAR
    positions (channels < far_channels) / 0 elsewhere.  Pure strided slices
    + concat: regular DMA, no gathers.  Rebuilt every step from current
    positions (<= a few 100 MB at 1M atoms).
    """
    nx, ny, nz = plan.grid
    cap = plan.cap
    nzg, nyg = g.shape[0], g.shape[1]
    nz_out = nzg - 2
    c = g.shape[2]
    nxb = nx // bx
    g5 = g.reshape(nzg, nyg, c, nx + 2, cap)
    chunks = []
    if bx >= 2:
        # Regrouped decomposition (round-3 perf): the bx+2 per-wx chunks
        # with x-stride bx coalesce into TWO coarse contiguous views —
        #   A: cells [0, nx)       viewed (nxb, bx*cap): wx in [0, bx)
        #   B: cells [bx, nx+bx)   viewed (nxb, bx*cap): wx = bx, bx+1
        # Same window-lane layout, 18 dense copies instead of 54 strided
        # slices (XLA lowers fine-grained strided slice/scatter poorly).
        if bx > 2:  # view B needs x-extent nx+bx; pad ghost cells with FAR
            padx = jnp.zeros(
                (nzg, nyg, c, bx - 2, cap), g5.dtype
            ).at[:, :, :3].set(FAR).at[:, :, 3:4].set(-1.0)
            g5b = jnp.concatenate([g5, padx], axis=3)
        else:
            g5b = g5
        view_a = g5[:, :, :, 0:nx].reshape(nzg, nyg, c, nxb, bx * cap)
        view_b = g5b[:, :, :, bx:nx + bx].reshape(
            nzg, nyg, c, nxb, bx * cap)[..., :2 * cap]
        for dz in range(3):
            for dy in range(3):
                for v in (view_a, view_b):
                    sl = v[dz:dz + nz_out, dy:dy + ny]
                    chunks.append(jnp.moveaxis(sl, 3, 2))
    else:
        for dz in range(3):
            for dy in range(3):
                for wx in range(bx + 2):
                    sl = g5[dz:dz + nz_out, dy:dy + ny, :,
                            wx:wx + (nxb - 1) * bx + 1:bx]
                    # (nz_out, ny, C, nxb, cap) -> (nz_out, ny, nxb, C, cap)
                    chunks.append(jnp.moveaxis(sl, 3, 2))
    cand = jnp.concatenate(chunks, axis=-1)
    used = 9 * (bx + 2) * cap
    if wl > used:
        padshape = cand.shape[:-1] + (wl - used,)
        pad = jnp.zeros(padshape, cand.dtype)
        if far_channels:
            pad = pad.at[..., :far_channels, :].set(FAR)
        # type channel (index 3 of position packs) parks at -1
        if c >= 4 and far_channels == 3:
            pad = pad.at[..., 3, :].set(-1.0)
        cand = jnp.concatenate([cand, pad], axis=-1)
    return cand


def fold_block_windows(dw, plan: DenseGridPlan, bx: int):
    """Adjoint of pack_block_windows: window cotangents
    (nz, ny, C, nxb, wl) -> ghost-grid cotangents (nzg, nyg, C, nxg*cap).

    The channel axis arrives OUTSIDE the x-block axis (the scatter kernel
    emits that layout directly) so every read is contiguous.  Formulated as
    a SUM OF ZERO-PADDED READS (one jnp.pad per window group, single fused
    output loop) rather than slice-adds into a zeros buffer: the 18
    overlapping `.at[].add`s alias each other, so XLA lowered them as a
    serial read-modify-write chain over the full array — measured ~10x the
    traffic bound at 1M atoms (PERF_NOTES round-3 "window folds").
    """
    nx, ny, nz = plan.grid
    cap = plan.cap
    nxb = nx // bx
    c = dw.shape[2]

    def zpad(seg, dz, dy, xlo, xhi):
        return jnp.pad(
            seg,
            ((dz, 2 - dz), (dy, 2 - dy), (0, 0), (xlo, xhi), (0, 0)),
        )

    total = None
    if bx >= 2:
        # Adjoint of the regrouped pack (see pack_block_windows): the A view
        # lands at x cells [0, nx), the B view at [bx, nx + bx).
        nxp = nx + max(2, bx)
        wgrp = (bx + 2) * cap
        for k, (dz, dy) in enumerate(
            (dz, dy) for dz in range(3) for dy in range(3)
        ):
            seg = dw[..., k * wgrp:(k + 1) * wgrp]  # (nz, ny, C, nxb, (bx+2)cap)
            seg_a = seg[..., :bx * cap].reshape(
                seg.shape[:3] + (nx, cap))
            seg_b = seg[..., bx * cap:]  # (.., nxb, 2cap)
            if bx > 2:
                seg_b = jnp.pad(seg_b, ((0, 0),) * 4 + ((0, (bx - 2) * cap),))
            seg_b = seg_b.reshape(seg.shape[:3] + (nx, cap))
            v = (zpad(seg_a, dz, dy, 0, nxp - nx)
                 + zpad(seg_b, dz, dy, bx, nxp - nx - bx))
            total = v if total is None else total + v
        total = total[:, :, :, :nx + 2]
    else:
        k = 0
        for dz in range(3):
            for dy in range(3):
                for wx in range(bx + 2):
                    seg = dw[..., k * cap:(k + 1) * cap]  # (nz, ny, C, nxb, cap)
                    v = zpad(seg, dz, dy, wx, 2 - wx)
                    total = v if total is None else total + v
                    k += 1
    return total.reshape(nz + 2, ny + 2, c, (nx + 2) * cap)


def fold_ghost_grad_c(dg, plan: DenseGridPlan):
    """fold_ghost_grad for an arbitrary channel count: (nzg, nyg, C, lanes)
    -> (n_slots, C)."""
    cap = plan.cap
    c = dg.shape[2]
    g = dg
    core = g[1:-1] + 0.0
    if plan.pbc[2]:
        core = core.at[-1].add(g[0])
        core = core.at[0].add(g[-1])
    g = core
    core = g[:, 1:-1] + 0.0
    if plan.pbc[1]:
        core = core.at[:, -1].add(g[:, 0])
        core = core.at[:, 0].add(g[:, -1])
    g = core
    inner = g[..., cap:-cap] + 0.0
    if plan.pbc[0]:
        inner = inner.at[..., -cap:].add(g[..., :cap])
        inner = inner.at[..., :cap].add(g[..., -cap:])
    return jnp.moveaxis(inner, 2, 0).reshape(c, -1).T


def fold_candidate_grad(dcand, plan: DenseGridPlan, dtype=None):
    """Adjoint of pack_candidates on the position channels.

    dcand: (nz, ny, nx, 3, C) candidate cotangents ->
    (nz+2, ny+2, 3, (nx+2)*cap) ghost-grid cotangents (feed fold_ghost_grad).
    27 static cell-aligned slice-adds — no scatters.
    """
    nx, ny, nz = plan.grid
    cap = plan.cap
    dtype = dtype or dcand.dtype
    dg5 = jnp.zeros((nz + 2, ny + 2, nx + 2, 3, cap), dtype)
    k = 0
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                seg = dcand[..., k * cap : (k + 1) * cap]
                dg5 = dg5.at[
                    dz : dz + nz, dy : dy + ny, dx : dx + nx
                ].add(seg)
                k += 1
    # (nzg, nyg, nxg, 3, cap) -> (nzg, nyg, 3, nxg*cap)
    dg = jnp.moveaxis(dg5, 2, 3).reshape(
        nz + 2, ny + 2, 3, (nx + 2) * cap
    )
    return dg
