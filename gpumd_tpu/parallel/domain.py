"""Multi-chip domain decomposition over a JAX mesh.

The reference's NEP_MULTIGPU shards atoms into 1-D spatial slabs with
2*rc halo rings, staged through GPU 0 with device-to-device memcpys
(ref: src/force/nep_multigpu.cu:1424-1803).

TPU-native redesign: one SPMD program over a Mesh("atoms").  Each device
owns a static slice of the (padded) atom axis.  Instead of hand-managed
halo buffers, v1 all-gathers the position/type arrays over ICI (24 MB at
1M atoms — cheap relative to the force math) and computes forces for the
owned slice only; the scatter half of the partial-force reduction is a
psum over per-device segment sums.  This is exactly the reference's
"descriptors for owned + halo, forces for owned" split, with XLA
collectives replacing the staged memcpys.  A ppermute slab-halo variant
can replace the all-gather when position traffic ever dominates.

For best locality the caller should pre-sort atoms by a spatial key so
each shard is a contiguous slab (see `sort_by_slab`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gpumd_tpu.forcefield import NeighborConfig
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import MDState


def make_mesh(n_devices: Optional[int] = None, axis: str = "atoms") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sort_by_slab(position, box: Box, axis: int = 0):
    """Host-side: permutation sorting atoms along one box direction so each
    mesh shard owns a spatial slab (reference partitions along the longest
    axis, nep_multigpu.cu:1429-1455)."""
    frac = np.asarray(box.fractional(position))
    return np.argsort(frac[:, axis], kind="stable")


@dataclass(frozen=True)
class ShardedMD:
    """Atom-sharded force evaluation + velocity-Verlet stepping.

    All per-atom arrays are sharded over `mesh` on their leading axis;
    N_pad must be divisible by the mesh size.
    """

    potentials: tuple
    neighbor: NeighborConfig
    mesh: Mesh
    axis: str = "atoms"

    @staticmethod
    def create(potentials, box: Box, n_atoms: int, mesh: Mesh, mn: int = 256):
        rc = max(p.rc for p in potentials)
        cfg = NeighborConfig.create(box, rc, n_atoms, mn=mn)
        return ShardedMD(potentials=tuple(potentials), neighbor=cfg, mesh=mesh)

    def _spec(self):
        return P(self.axis)

    def shard_state(self, state: MDState) -> MDState:
        """Place per-atom arrays on the mesh (replicating box/step)."""
        sh = NamedSharding(self.mesh, P(self.axis))
        rep = NamedSharding(self.mesh, P())

        def put(x, path=""):
            return jax.device_put(x, sh)

        return MDState(
            position=put(state.position),
            velocity=put(state.velocity),
            force=put(state.force),
            mass=put(state.mass),
            type=put(state.type),
            box=jax.device_put(state.box, rep),
            potential_energy=put(state.potential_energy),
            virial=put(state.virial),
            heat_current=put(state.heat_current),
            mask=put(state.mask),
            charge=put(state.charge) if state.charge is not None else None,
            unwrapped_position=(
                put(state.unwrapped_position)
                if state.unwrapped_position is not None
                else None
            ),
            step=jax.device_put(state.step, rep),
        )

    # -- sharded force pass ---------------------------------------------------

    def compute_forces(self, state: MDState) -> MDState:
        """SPMD force evaluation: local neighbor build against the gathered
        global positions, local potential eval, psum'd scatter reduction."""
        ax = self.axis
        cfg = self.neighbor
        pots = self.potentials

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(ax), P(ax), P(ax), P(), P()),
            out_specs=(P(ax), P(ax), P(ax), P(ax)),
        )
        def spmd(pos_l, type_l, mask_l, h, pbc):
            box = Box(h=h, h_inv=_inv3(h), pbc=pbc)
            n_local = pos_l.shape[0]
            my = jax.lax.axis_index(ax)
            # Global candidate arrays (halo superset) over ICI.
            pos_g = jax.lax.all_gather(pos_l, ax, tiled=True)
            type_g = jax.lax.all_gather(type_l, ax, tiled=True)
            mask_g = jax.lax.all_gather(mask_l, ax, tiled=True)
            n_global = pos_g.shape[0]

            nbr = _local_neighbors(
                pos_l, mask_l, pos_g, mask_g, box, cfg, my * n_local
            )

            e = jnp.zeros((n_local,), pos_l.dtype)
            p_sum = jnp.zeros((n_local, 3), pos_l.dtype)
            recv_f = jnp.zeros((n_global, 3), pos_l.dtype)
            recv_w = jnp.zeros((n_global, 3, 3), pos_l.dtype)
            for pot in pots:
                t2 = type_g[nbr.idx]

                def energy_fn(r12, _pot=pot, _t2=t2):
                    return _pot.pair_energies(r12, type_l, _t2)

                e_atom, vjp = jax.vjp(energy_fn, nbr.r12)
                (pp,) = vjp(mask_l.astype(pos_l.dtype))
                e = e + e_atom * mask_l
                p_sum = p_sum + jnp.sum(pp, axis=1)
                flat_idx = nbr.idx.reshape(-1)
                recv_f = recv_f + jax.ops.segment_sum(
                    pp.reshape(-1, 3), flat_idx, num_segments=n_global
                )
                w_pair = -nbr.r12[..., :, None] * pp[..., None, :]
                w_pair = w_pair * nbr.mask[..., None, None]
                recv_w = recv_w + jax.ops.segment_sum(
                    w_pair.reshape(-1, 3, 3), flat_idx, num_segments=n_global
                )
            # Sum scatter contributions across devices, keep own slice.
            recv_f = jax.lax.psum_scatter(recv_f, ax, scatter_dimension=0, tiled=True)
            recv_w = jax.lax.psum_scatter(recv_w, ax, scatter_dimension=0, tiled=True)
            force = p_sum - recv_f
            return e, force, recv_w, nbr.count

        e, force, virial, _ = spmd(
            state.box.wrap(state.position), state.type, state.mask,
            state.box.h, state.box.pbc,
        )
        j = jnp.einsum("nab,nb->na", virial, state.velocity)
        return state._replace(
            force=force, potential_energy=e, virial=virial, heat_current=j
        )


def _inv3(h):
    from gpumd_tpu.model.box import inv3

    return inv3(h)


def _local_neighbors(pos_l, mask_l, pos_g, mask_g, box, cfg, row_offset):
    """Neighbor list for the local atoms against the global candidate set.

    Dispatch: O(N) cell-list build when the box is thick enough
    (cfg.method == "cell", the production path — each device bins the
    gathered candidates once and walks the 27-cell stencil for its own
    rows only), else the brute-force path with image shifts (small boxes).
    Returns global neighbor indices.
    """
    if cfg.method == "cell":
        return _local_neighbors_cell(
            pos_l, mask_l, pos_g, mask_g, box, cfg, row_offset
        )
    from gpumd_tpu.neighbor.neighbor import _FAR, _compact_rows, _image_shifts

    n_l = pos_l.shape[0]
    n_g = pos_g.shape[0]
    dtype = pos_l.dtype
    shifts = jnp.asarray(_image_shifts(cfg.reps, np.float64), dtype=dtype) @ box.h.T
    n_img = shifts.shape[0]

    rij = pos_g[None, :, :] - pos_l[:, None, :]
    rij = box.minimum_image(rij)
    rij_all = rij[:, :, None, :] + shifts[None, None, :, :]
    d2 = jnp.sum(rij_all**2, axis=-1)
    my_rows = row_offset + jnp.arange(n_l)
    is_self = (my_rows[:, None] == jnp.arange(n_g)[None, :])[:, :, None] & (
        jnp.arange(n_img) == 0
    )[None, None, :]
    valid = (
        (d2 < cfg.rc * cfg.rc)
        & (mask_l[:, None] > 0)[..., None]
        & (mask_g[None, :] > 0)[..., None]
        & ~is_self
    )
    valid2 = valid.reshape(n_l, n_g * n_img)
    count = jnp.sum(valid2, axis=-1).astype(jnp.int32)
    src, slot_valid = _compact_rows(valid2, cfg.mn)
    r12 = jnp.take_along_axis(
        rij_all.reshape(n_l, n_g * n_img, 3), src[:, :, None], axis=1
    )
    idx = jnp.where(slot_valid, src // n_img, my_rows[:, None])
    r12 = jnp.where(slot_valid[:, :, None], r12, _FAR)

    from gpumd_tpu.neighbor.neighbor import NeighborList

    return NeighborList(
        idx=idx.astype(jnp.int32),
        r12=r12,
        mask=slot_valid.astype(dtype),
        count=count,
    )


def _local_neighbors_cell(pos_l, mask_l, pos_g, mask_g, box, cfg, row_offset):
    """Cell-list neighbor build for the local rows against the gathered
    global candidates (mirrors neighbor_cell_list's sort-based binning,
    restricted to this shard's atoms — the reference's per-GPU neighbor
    build over owned + halo slabs, nep_multigpu.cu:1585-1650)."""
    from gpumd_tpu.neighbor.neighbor import (
        _FAR, NeighborList, _compact_rows,
    )

    n_l = pos_l.shape[0]
    n_g = pos_g.shape[0]
    dtype = pos_l.dtype
    nx, ny, nz = cfg.grid
    n_cells = nx * ny * nz
    gridf = jnp.asarray([nx, ny, nz], dtype=dtype)

    s = pos_g @ box.h_inv.T
    s = s - jnp.floor(s) * box.pbc
    cell_xyz = jnp.clip(
        jnp.floor(s * gridf).astype(jnp.int32), 0,
        jnp.asarray([nx - 1, ny - 1, nz - 1]),
    )
    cell_id = (cell_xyz[:, 2] * ny + cell_xyz[:, 1]) * nx + cell_xyz[:, 0]
    cell_id = jnp.where(mask_g > 0, cell_id, n_cells)
    order = jnp.argsort(cell_id, stable=True)
    sorted_cell = cell_id[order]
    cell_start = jnp.searchsorted(sorted_cell, jnp.arange(n_cells + 1))

    offs = jnp.asarray(
        [(i, j, k) for k in (-1, 0, 1) for j in (-1, 0, 1)
         for i in (-1, 0, 1)],
        dtype=jnp.int32,
    )
    dims = jnp.asarray([nx, ny, nz])
    pbc_i = box.pbc.astype(bool)
    cell_cap = cfg.cell_cap
    n_cand = 27 * cell_cap
    slot = jnp.arange(cell_cap, dtype=jnp.int32)

    rows = row_offset + jnp.arange(n_l)
    my_cell = cell_xyz[rows]  # (n_l, 3)
    neigh_xyz = my_cell[:, None, :] + offs[None, :, :]
    wrapped = jnp.mod(neigh_xyz, dims)
    in_range = jnp.all(
        pbc_i | ((neigh_xyz >= 0) & (neigh_xyz < dims)), axis=-1
    )
    ncell = (wrapped[..., 2] * ny + wrapped[..., 1]) * nx + wrapped[..., 0]
    ncell = jnp.where(in_range, ncell, n_cells)

    start = cell_start[ncell]
    end = cell_start[jnp.minimum(ncell + 1, n_cells)]
    end = jnp.where(ncell >= n_cells, start, end)
    cand_pos = start[:, :, None] + slot[None, None, :]  # (n_l, 27, cap)
    cand_valid = cand_pos < end[:, :, None]
    cand_j = order[jnp.minimum(cand_pos, n_g - 1)]

    rij = box.minimum_image(pos_g[cand_j] - pos_l[:, None, None, :])
    d2 = jnp.sum(rij**2, axis=-1)
    valid = (
        cand_valid
        & (d2 < cfg.rc * cfg.rc)
        & (cand_j != rows[:, None, None])
        & (mask_l[:, None, None] > 0)
    )
    valid2 = valid.reshape(n_l, n_cand)
    count = jnp.sum(valid2, axis=-1).astype(jnp.int32)
    src, slot_valid = _compact_rows(valid2, cfg.mn)
    r12 = jnp.take_along_axis(
        rij.reshape(n_l, n_cand, 3), src[:, :, None], axis=1
    )
    idx = jnp.take_along_axis(cand_j.reshape(n_l, n_cand), src, axis=1)
    idx = jnp.where(slot_valid, idx, rows[:, None])
    r12 = jnp.where(slot_valid[:, :, None], r12, _FAR)
    return NeighborList(
        idx=idx.astype(jnp.int32),
        r12=r12,
        mask=slot_valid.astype(dtype),
        count=count,
    )
