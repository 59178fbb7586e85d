"""Statically-shaped neighbor lists under jit.

The reference builds an O(N) cell list with atomic bin counts + a thrust
prefix sum + a 5^3 stencil gather (ref: src/force/neighbor.cu:42-220), and a
brute-force expanded-box path for boxes thinner than 2*rc
(ref: src/force/nep.cu:1141+, nep_small_box.cuh).

TPU-native redesign: everything is static-shape and sort-based.

  * `neighbor_brute`: all-pairs x periodic-images, for small N (training
    structures, test fixtures).  O(N^2 * n_images) but fully vectorized.
  * `neighbor_cell_list`: sort-by-cell binning (replaces atomics+scan),
    3^3 stencil over rc-sized cells, per-cell static capacity, top_k
    compaction to MN slots.  O(N * 27 * cell_cap).

Both return a `NeighborList` with a fixed (N, MN) layout:
  idx   : int32 neighbor atom index, padded with the atom's own index
  r12   : (N, MN, 3) displacement r_j + shift - r_i (image-resolved)
  mask  : (N, MN) 1.0 where the slot holds a real neighbor within rc

Padded slots point at self with a huge displacement so smooth-cutoff
potentials contribute exactly zero without extra branching; `mask` is
there for potentials with hard cutoffs (LJ).

Overflow policy: the builders also return `max_occupancy` so callers can
checkify/assert MN was large enough (the reference aborts; we surface a
flag that tests assert on).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box

# Displacement magnitude parked on padded slots; far outside any cutoff.
_FAR = 1.0e5


def gather_vec3(points, idx):
    """Gather (..., 3) vectors by index with TPU-friendly layout.

    A direct points[idx] makes the gather output's minor dimension 3, which
    XLA pads to 128 lanes on TPU (42x memory).  Gathering per component
    keeps the wide axis minor; the stack is a cheap fused transpose.
    """
    return jnp.stack([points[:, k][idx] for k in range(points.shape[1])], axis=-1)


class NeighborList(NamedTuple):
    idx: jnp.ndarray  # (N, MN) int32
    r12: jnp.ndarray  # (N, MN, 3)
    mask: jnp.ndarray  # (N, MN)
    count: jnp.ndarray  # (N,) int32 true neighbor count (pre-cap)
    # Optional reverse-pair map: rev[i, m] = flat index j*MN + m' of the
    # mirror slot (idx[j, m'] == i with opposite image shift).  Enables the
    # reference's gather-only force reduction (potential.cu:73-113) instead
    # of a scatter — much faster on TPU.
    rev: Optional[jnp.ndarray] = None  # (N, MN) int32

    @property
    def max_neighbors(self) -> int:
        return self.idx.shape[1]

    def overflowed(self):
        """True if any atom had more neighbors than MN slots."""
        return jnp.any(self.count > self.max_neighbors)


def build_reverse_map(nbr: NeighborList, shift_frac: jnp.ndarray) -> jnp.ndarray:
    """rev[i, m] = flat index j * MN + m' of the mirror pair slot
    (idx[j, m'] == i with the opposite image shift).

    Sort-based pairing: every ordered pair (i -> j, shift s) gets the
    canonical key (min(i,j), max(i,j), canonical shift); a pair and its
    mirror share the key, all keys are otherwise unique, so after one
    argsort mirror slots sit at positions 2k / 2k+1.  O(P log P) for
    P = N*MN pairs, no MN^2 blowup — paid once per Verlet rebuild.

    Requires a loss-free neighbor list (no MN overflow), which the builders
    report via `count`.  Invalid slots get arbitrary in-range values;
    consumers mask gathered reverse values by nbr.mask.
    """
    n, mn = nbr.idx.shape
    if (n * mn) % 2 != 0:
        raise ValueError("N * MN must be even for pair matching (use even MN)")
    i = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, mn))
    j = nbr.idx
    a = jnp.minimum(i, j)
    b = jnp.maximum(i, j)
    s = shift_frac.astype(jnp.int32)

    # shifts are small integers (|s| < 16 by construction)
    def _enc(sv):
        return (sv[..., 0] + 16) + 33 * (sv[..., 1] + 16) + 1089 * (sv[..., 2] + 16)

    # Canonical orientation: atom order for i != j; shift sign for self-image
    # pairs (i == j via periodic images), where both mirror slots must share
    # one key — choosing by atom order alone would give slot (+s) the key
    # enc(-s) and slot (-s) the key enc(+s), mispairing mirrors when several
    # self-image shifts coexist (box edge < rc along >= 2 axes).
    keep = (i < j) | ((i == j) & (_enc(s) > _enc(-s)))
    s = jnp.where(keep[..., None], s, -s)
    enc = _enc(s)
    valid = nbr.mask.reshape(-1) > 0
    flat = jnp.arange(n * mn, dtype=jnp.int32)
    # Invalid slots sort to the tail with unique keys (valid pair count is
    # even, so valid mirrors stay 2k/2k+1-aligned at the front).
    a = jnp.where(valid, a.reshape(-1), n)
    b = jnp.where(valid, b.reshape(-1), flat)
    enc = jnp.where(valid, enc.reshape(-1), 0)
    # Lexicographic 3-key sort in one pass; 4th operand carries positions.
    _, _, _, order = jax.lax.sort((a, b, enc, flat), num_keys=3)
    swapped = order.reshape(-1, 2)[:, ::-1].reshape(-1)
    inv = jnp.argsort(order)
    return swapped[inv].reshape(n, mn)


def _image_shifts(reps: Sequence[int], dtype) -> np.ndarray:
    """Enumerate integer image shifts [-m, m]^3 as an (n_img, 3) array with
    the zero shift first (host-side, static)."""
    rx, ry, rz = reps
    shifts = [
        (i, j, k)
        for i in range(-rx, rx + 1)
        for j in range(-ry, ry + 1)
        for k in range(-rz, rz + 1)
    ]
    shifts.sort(key=lambda s: (s != (0, 0, 0),))  # zero image first
    return np.asarray(shifts, dtype=dtype)


def _compact_rows(valid, mn):
    """Take up to MN valid candidates per row, preferring any valid ones.

    Returns (slot_source, slot_valid): for each of MN slots the candidate
    column index it draws from, and whether that slot is real.
    Uses top_k on a key that ranks valid candidates first (by column order,
    keeping deterministic layout), which lowers to an efficient sort on TPU.
    """
    n_cand = valid.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, valid.shape, valid.ndim - 1)
    # Valid candidates keep their column index; invalid ones get pushed
    # past every valid one. Negate for top_k (which takes largest).
    key = jnp.where(valid, col, n_cand + col)
    k = min(mn, n_cand)
    neg_key, src = jax.lax.top_k(-key, k)
    slot_valid = (-neg_key) < n_cand
    if k < mn:  # fewer candidates than slots: pad with invalid slots
        pad = [(0, 0)] * (valid.ndim - 1) + [(0, mn - k)]
        src = jnp.pad(src, pad)
        slot_valid = jnp.pad(slot_valid, pad)
    return src, slot_valid


@functools.partial(jax.jit, static_argnames=("rc", "mn", "reps", "row_block"))
def neighbor_brute(
    position: jnp.ndarray,
    box: Box,
    mask: jnp.ndarray,
    *,
    rc: float,
    mn: int,
    reps: tuple = (0, 0, 0),
    row_block: int = 512,
) -> NeighborList:
    """All-pairs neighbor build with periodic image enumeration.

    Exact for arbitrarily small boxes given `reps` from
    `num_replicas_for_cutoff`.  Rows are processed in static blocks so peak
    memory is O(row_block * N * n_img) regardless of N.
    """
    n = position.shape[0]
    dtype = position.dtype
    shifts_frac = jnp.asarray(_image_shifts(reps, np.float64), dtype=dtype)
    # integer-combination lattice shifts: HIGHEST precision (tiny matmul;
    # the MXU's DEFAULT bf16 pass would round ghost shifts by ~0.4%)
    shifts_cart = jnp.matmul(
        shifts_frac, box.h.T, precision=jax.lax.Precision.HIGHEST
    )  # (n_img, 3)
    n_img = shifts_cart.shape[0]

    blk = min(row_block, n)
    n_blocks = -(-n // blk)
    n_pad_rows = n_blocks * blk
    pos_pad = jnp.pad(position, ((0, n_pad_rows - n), (0, 0)))
    row_ids = jnp.arange(n_pad_rows).reshape(n_blocks, blk)

    def one_block(rows):
        ri = pos_pad[rows]  # (blk, 3)
        rij = position[None, :, :] - ri[:, None, :]  # (blk, N, 3) j - i
        rij = box.minimum_image(rij)
        rij_all = rij[:, :, None, :] + shifts_cart[None, None, :, :]
        d2 = jnp.sum(rij_all**2, axis=-1)  # (blk, N, n_img)

        row_real = (rows < n) & (jnp.where(rows < n, mask[jnp.minimum(rows, n - 1)], 0.0) > 0)
        pair = row_real[:, None] & (mask[None, :] > 0)
        is_self = (rows[:, None] == jnp.arange(n)[None, :])[:, :, None] & (
            jnp.arange(n_img) == 0
        )[None, None, :]
        valid = (d2 < rc * rc) & pair[:, :, None] & ~is_self

        valid2 = valid.reshape(blk, n * n_img)
        cnt = jnp.sum(valid2, axis=-1).astype(jnp.int32)
        src, slot_valid = _compact_rows(valid2, mn)
        j_of_src = src // n_img
        r12 = jnp.take_along_axis(
            rij_all.reshape(blk, n * n_img, 3), src[:, :, None], axis=1
        )
        idx = jnp.where(slot_valid, j_of_src, jnp.minimum(rows, n - 1)[:, None])
        r12 = jnp.where(slot_valid[:, :, None], r12, _FAR)
        return idx.astype(jnp.int32), r12, slot_valid.astype(dtype), cnt

    idx, r12, smask, count = jax.lax.map(one_block, row_ids)
    return NeighborList(
        idx=idx.reshape(n_pad_rows, mn)[:n],
        r12=r12.reshape(n_pad_rows, mn, 3)[:n],
        mask=smask.reshape(n_pad_rows, mn)[:n],
        count=count.reshape(n_pad_rows)[:n],
    )


@functools.partial(
    jax.jit, static_argnames=("rc", "mn", "grid", "cell_cap", "row_block")
)
def neighbor_cell_list(
    position: jnp.ndarray,
    box: Box,
    mask: jnp.ndarray,
    *,
    rc: float,
    mn: int,
    grid: tuple,
    cell_cap: int,
    row_block: int = 16384,
) -> NeighborList:
    """O(N) sort-based cell-list neighbor build.

    Args:
      grid: static (nx, ny, nz) cell counts per direction; each cell must be
        at least rc thick (host computes grid from box thickness / rc).
        Requires nx, ny, nz >= 3 for fully periodic boxes (same constraint
        as the reference's large-box path).
      cell_cap: static max atoms per cell (overflow detectable via count).

    Replaces the reference's atomics+prefix-sum binning with a full sort by
    cell id — deterministic and XLA-friendly.
    """
    n = position.shape[0]
    dtype = position.dtype
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    gridf = jnp.asarray([nx, ny, nz], dtype=dtype)

    # Fractional coords wrapped to [0, 1) along periodic dirs.
    s = position @ box.h_inv.T
    s = s - jnp.floor(s) * box.pbc
    cell_xyz = jnp.clip(jnp.floor(s * gridf).astype(jnp.int32), 0,
                        jnp.asarray([nx - 1, ny - 1, nz - 1]))
    cell_id = (cell_xyz[:, 2] * ny + cell_xyz[:, 1]) * nx + cell_xyz[:, 0]
    # Padding atoms go to a virtual overflow cell so they never appear.
    cell_id = jnp.where(mask > 0, cell_id, n_cells)

    # Sort atoms by cell id (stable -> deterministic layout).
    order = jnp.argsort(cell_id, stable=True)
    sorted_cell = cell_id[order]
    # Start offset of each cell in the sorted order.
    cell_start = jnp.searchsorted(sorted_cell, jnp.arange(n_cells + 1))

    # Stencil gather, processed in static row blocks to bound peak memory.
    offs = jnp.asarray(
        [(i, j, k) for k in (-1, 0, 1) for j in (-1, 0, 1) for i in (-1, 0, 1)],
        dtype=jnp.int32,
    )  # (27, 3)
    dims = jnp.asarray([nx, ny, nz])
    pbc_i = box.pbc.astype(bool)
    n_cand = 27 * cell_cap
    slot = jnp.arange(cell_cap, dtype=jnp.int32)

    blk = min(row_block, n)
    n_blocks = -(-n // blk)
    n_rows = n_blocks * blk
    rows_all = jnp.arange(n_rows).reshape(n_blocks, blk)

    def one_block(rows):
        rows_c = jnp.minimum(rows, n - 1)
        my_cell = cell_xyz[rows_c]  # (B, 3)
        neigh_xyz = my_cell[:, None, :] + offs[None, :, :]  # (B, 27, 3)
        wrapped = jnp.mod(neigh_xyz, dims)
        in_range = jnp.all(
            pbc_i | ((neigh_xyz >= 0) & (neigh_xyz < dims)), axis=-1
        )
        ncell = (wrapped[..., 2] * ny + wrapped[..., 1]) * nx + wrapped[..., 0]
        ncell = jnp.where(in_range, ncell, n_cells)

        start = cell_start[ncell]
        end = cell_start[jnp.minimum(ncell + 1, n_cells)]
        end = jnp.where(ncell >= n_cells, start, end)
        cand_pos = start[:, :, None] + slot[None, None, :]  # (B, 27, cap)
        cand_valid = cand_pos < end[:, :, None]
        cand_j = order[jnp.minimum(cand_pos, n - 1)]  # (B, 27, cap)

        ri = gather_vec3(position, rows_c)
        rij = box.minimum_image(
            gather_vec3(position, cand_j) - ri[:, None, None, :]
        )
        d2 = jnp.sum(rij**2, axis=-1)
        row_real = (rows < n) & (mask[rows_c] > 0)
        valid = (
            cand_valid
            & (d2 < rc * rc)
            & (cand_j != rows_c[:, None, None])
            & row_real[:, None, None]
        )
        valid2 = valid.reshape(blk, n_cand)
        cnt = jnp.sum(valid2, axis=-1).astype(jnp.int32)
        src, slot_valid = _compact_rows(valid2, mn)
        r12 = jnp.take_along_axis(rij.reshape(blk, n_cand, 3), src[:, :, None], axis=1)
        idx = jnp.take_along_axis(cand_j.reshape(blk, n_cand), src, axis=1)
        idx = jnp.where(slot_valid, idx, rows_c[:, None])
        r12 = jnp.where(slot_valid[:, :, None], r12, _FAR)
        return idx.astype(jnp.int32), r12, slot_valid.astype(dtype), cnt

    if n_blocks == 1:
        idx, r12, smask, count = one_block(rows_all[0])
        return NeighborList(idx=idx[:n], r12=r12[:n], mask=smask[:n], count=count[:n])
    idx, r12, smask, count = jax.lax.map(one_block, rows_all)
    return NeighborList(
        idx=idx.reshape(n_rows, mn)[:n],
        r12=r12.reshape(n_rows, mn, 3)[:n],
        mask=smask.reshape(n_rows, mn)[:n],
        count=count.reshape(n_rows)[:n],
    )


@functools.partial(
    jax.jit, static_argnames=("rc", "mn", "grid", "cell_cap")
)
def neighbor_cell_dense(
    position: jnp.ndarray,
    box: Box,
    mask: jnp.ndarray,
    *,
    rc: float,
    mn: int,
    grid: tuple,
    cell_cap: int,
) -> NeighborList:
    """Roll-based O(N) neighbor build with fully regular memory access.

    TPU redesign of the cell list: atoms are scattered once into a dense
    (nz, ny, nx, cap) cell-major layout; the 3^3 stencil becomes 27
    `jnp.roll`s of that regular array (no random gathers), distances are
    computed cell-against-cell, and only BOOLEAN validity bits are
    materialized for the 27*cap candidate axis.  After top_k compaction the
    chosen displacements are recomputed from one (N, MN) gather.

    Periodic wrap enters as a per-cell integer lattice shift (exact), so no
    minimum-image rounding is involved at all.
    """
    n = position.shape[0]
    dtype = position.dtype
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    nslots = n_cells * cell_cap

    # ---- binning
    gridf = jnp.asarray([nx, ny, nz], dtype=dtype)
    s = position @ box.h_inv.T
    s = s - jnp.floor(s) * box.pbc
    cell_xyz = jnp.clip(
        jnp.floor(s * gridf).astype(jnp.int32),
        0,
        jnp.asarray([nx - 1, ny - 1, nz - 1]),
    )
    cell_id = (cell_xyz[:, 2] * ny + cell_xyz[:, 1]) * nx + cell_xyz[:, 0]
    cell_id = jnp.where(mask > 0, cell_id, n_cells)  # padding -> overflow cell
    order = jnp.argsort(cell_id)  # (N,)
    sorted_cell = cell_id[order]
    cell_start = jnp.searchsorted(sorted_cell, jnp.arange(n_cells + 1))
    rank = jnp.arange(n, dtype=jnp.int32) - cell_start[
        jnp.minimum(sorted_cell, n_cells)
    ].astype(jnp.int32)
    occupancy = (cell_start[1:] - cell_start[:-1]).astype(jnp.int32)
    cell_overflow = occupancy.max() > cell_cap

    # ---- dense cell-major arrays (one scatter)
    dest = sorted_cell * cell_cap + jnp.minimum(rank, cell_cap - 1)
    dest = jnp.where(
        (rank < cell_cap) & (sorted_cell < n_cells), dest, nslots
    )  # dropped rows go to a sink slot
    pos_sorted = position[order]
    dense_pos = jnp.full((nslots + 1, 3), _FAR, dtype)
    dense_pos = dense_pos.at[dest].set(pos_sorted, mode="drop")
    dense_pos = dense_pos[:nslots]
    dense_idx = jnp.full((nslots + 1,), 0, jnp.int32)
    dense_idx = dense_idx.at[dest].set(order.astype(jnp.int32), mode="drop")
    dense_idx = dense_idx[:nslots]
    dense_valid = jnp.zeros((nslots + 1,), bool).at[dest].set(True, mode="drop")
    dense_valid = dense_valid[:nslots]

    grid_pos = dense_pos.reshape(nz, ny, nx, cell_cap, 3)
    grid_valid = dense_valid.reshape(nz, ny, nx, cell_cap)

    # per-axis cell coordinates for wrap shifts
    ix = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 0)
    dims = (nx, ny, nz)
    coords = (ix, iy, iz)
    rc2 = rc * rc
    # Stencil as a lax.scan over the 27 offsets (unrolling blew up XLA
    # compile time at large N); rolls take traced shifts.
    offsets = [
        (ox, oy, oz)
        for oz in (-1, 0, 1)
        for oy in (-1, 0, 1)
        for ox in (-1, 0, 1)
    ]
    offs_arr = jnp.asarray(offsets, jnp.int32)  # (27, 3)
    cap_eye = jnp.eye(cell_cap, dtype=bool)

    def one_offset(_, off):
        ox, oy, oz = off[0], off[1], off[2]
        rolled_pos = jnp.roll(grid_pos, shift=(-oz, -oy, -ox), axis=(0, 1, 2))
        rolled_valid = jnp.roll(
            grid_valid, shift=(-oz, -oy, -ox), axis=(0, 1, 2)
        )
        # integer lattice shift for wrapped cells; invalid if non-periodic
        shift_fracs = []
        inbounds = jnp.ones((nz, ny, nx), bool)
        for axis, (o, coord, dim) in enumerate(
            zip((ox, oy, oz), coords, dims)
        ):
            wrapped_hi = coord + o >= dim
            wrapped_lo = coord + o < 0
            shift_fracs.append(
                jnp.where(wrapped_hi, 1.0, 0.0)
                + jnp.where(wrapped_lo, -1.0, 0.0)
            )
            inbounds = inbounds & (
                ~(wrapped_hi | wrapped_lo) | (box.pbc[axis] > 0)
            )
        h = box.h.astype(dtype)
        # per-component cart shift (keeps vec3 out of minor dims)
        shift_cart = [
            shift_fracs[0] * h[k, 0]
            + shift_fracs[1] * h[k, 1]
            + shift_fracs[2] * h[k, 2]
            for k in range(3)
        ]
        d2 = 0.0
        for k in range(3):
            diff_k = (
                rolled_pos[..., None, :, k]
                + shift_cart[k][..., None, None]
                - grid_pos[..., :, None, k]
            )
            d2 = d2 + diff_k * diff_k  # (nz, ny, nx, cap, cap)
        ok = (
            (d2 < rc2)
            & rolled_valid[..., None, :]
            & grid_valid[..., :, None]
            & inbounds[..., None, None]
        )
        is_zero = (ox == 0) & (oy == 0) & (oz == 0)
        ok = ok & ~(is_zero & cap_eye)
        return None, ok.reshape(nslots, cell_cap)

    _, valid_off = jax.lax.scan(one_offset, None, offs_arr)  # (27, nslots, cap)
    valid2 = jnp.transpose(valid_off, (1, 0, 2)).reshape(
        nslots, 27 * cell_cap
    )
    count_dense = jnp.sum(valid2, axis=-1).astype(jnp.int32)
    src, slot_valid = _compact_rows(valid2, mn)  # (nslots, mn)

    # ---- decode selections -> neighbor atom indices + displacements.
    # Decoding is pure integer arithmetic (the offsets list has ox fastest),
    # and all vec3 assembly happens per component: XLA pins 128-lane-padded
    # layouts on gathers/fusions with a minor dim of 3 (42x memory).
    off_sel = src // cell_cap  # which stencil offset (0..26)
    slot_sel = src % cell_cap
    d_ox = off_sel % 3 - 1
    d_oy = (off_sel // 3) % 3 - 1
    d_oz = off_sel // 9 - 1
    cell_lin = jnp.arange(nslots, dtype=jnp.int32) // cell_cap
    cx = cell_lin % nx
    cy = (cell_lin // nx) % ny
    cz = cell_lin // (nx * ny)
    ncx = cx[:, None] + d_ox
    ncy = cy[:, None] + d_oy
    ncz = cz[:, None] + d_oz
    sfx = (ncx >= nx).astype(dtype) - (ncx < 0).astype(dtype)
    sfy = (ncy >= ny).astype(dtype) - (ncy < 0).astype(dtype)
    sfz = (ncz >= nz).astype(dtype) - (ncz < 0).astype(dtype)
    ncell = (
        jnp.mod(ncz, nz) * ny + jnp.mod(ncy, ny)
    ) * nx + jnp.mod(ncx, nx)
    j_dense = dense_idx[ncell * cell_cap + slot_sel]  # (nslots, mn)

    # ---- map back to atom order
    row_of_atom_sorted = dest  # position of sorted atom -> dense row
    inv_order = jnp.argsort(order)
    row_of_atom = jnp.minimum(row_of_atom_sorted[inv_order], nslots - 1)

    idx = j_dense[row_of_atom]  # (N, MN)
    sel_valid = slot_valid[row_of_atom] & (mask > 0)[:, None]
    h = box.h.astype(dtype)
    sfx_a, sfy_a, sfz_a = (
        sfx[row_of_atom], sfy[row_of_atom], sfz[row_of_atom]
    )
    comps = []
    for k in range(3):
        shift_k = sfx_a * h[k, 0] + sfy_a * h[k, 1] + sfz_a * h[k, 2]
        rk = position[:, k][idx] - position[:, k][:, None] + shift_k
        comps.append(jnp.where(sel_valid, rk, _FAR))
    r12 = jnp.stack(comps, axis=-1)
    idx = jnp.where(sel_valid, idx, jnp.arange(n, dtype=jnp.int32)[:, None])
    count = jnp.where(mask > 0, count_dense[row_of_atom], 0)
    # surface cell overflow as a neighbor-count overflow
    count = jnp.where(cell_overflow, jnp.full_like(count, mn + 1), count)
    return NeighborList(
        idx=idx,
        r12=r12,
        mask=sel_valid.astype(dtype),
        count=count,
    )


def choose_grid(box: Box, rc: float) -> Optional[tuple]:
    """Host-side: pick a cell grid with cells >= rc thick, or None if the box
    is too thin for the cell-list path (use brute + images instead)."""
    t = np.asarray(box.thickness())
    pbc = np.asarray(box.pbc)
    grid = []
    for d in range(3):
        nd = max(1, int(np.floor(float(t[d]) / rc)))
        if pbc[d] > 0 and nd < 3:
            return None
        grid.append(nd)
    return tuple(grid)


def build_neighbor_list(
    position,
    box: Box,
    mask,
    *,
    rc: float,
    mn: int,
    reps: tuple = (0, 0, 0),
    cell_cap: Optional[int] = None,
    force_brute: bool = False,
) -> NeighborList:
    """Dispatch between brute-force (small/thin boxes) and cell list.

    The dispatch mirrors the reference's small-box/large-box duality
    (ref: src/force/nep.cu:1356-1389) but on static host-side shape info.
    """
    n = position.shape[0]
    grid = None if force_brute else choose_grid(box, rc)
    if grid is None or n <= 2048:
        return neighbor_brute(position, box, mask, rc=rc, mn=mn, reps=reps)
    if cell_cap is None:
        # Expected atoms per cell times a safety factor.
        vol_cell = float(box.volume) / (grid[0] * grid[1] * grid[2])
        density = n / float(box.volume)
        cell_cap = max(8, int(np.ceil(density * vol_cell * 2.0)))
    return neighbor_cell_list(
        position, box, mask, rc=rc, mn=mn, grid=grid, cell_cap=cell_cap
    )
