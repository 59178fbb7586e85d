"""Fused Pallas fold: scatter-output window cotangents -> per-slot sums.

Replaces the XLA pair fold_block_windows (18 zero-padded shifted reads)
+ fold_ghost_grad_c (ghost-layer wrap adds) with ONE kernel instance per
(z, y) row.  The XLA pair measured 42 ms at 1M atoms against a ~5 ms
traffic bound (PERF_NOTES round 4) — the pad/sum chain materializes
intermediates; here every dw element is read exactly once and the
periodic wrap rides in the BlockSpec index maps.

Geometry (adjoint of grid.pack_block_windows): window group (dz, dy) of
block-row (zb, yb) holds candidates from interior row
(zb + dz - 1, yb + dy - 1) mod (nz, ny), at ghost x-cells
xb*bx + j for j in [0, bx+2), i.e. interior x-cell (xb*bx + j - 1) mod nx.
So output row (z, y) accumulates, for each of the 9 groups, the group
slice of source block-row ((z - dz + 1) % nz, (y - dy + 1) % ny):

  * j in [1, bx]:   lands at the block's own lanes, offset (j-1)*cap;
  * j = 0:          previous x-block's last cell  -> sublane roll -1;
  * j = bx + 1:     next x-block's first cell     -> sublane roll +1.

Periodic wrap on non-periodic axes is harmless here: the scatter only
writes lanes referenced by neighbor indices, and FAR ghost lanes are
never neighbors, so wrapped ghost contributions are exact zeros (the XLA
fold drops the same zeros).

Eligibility: wgrp = (bx+2)*cap must be lane-aligned (multiple of 128) and
tile the window exactly (wl == 9*wgrp); callers fall back to the XLA pair
otherwise (fold_windows_eligible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpumd_tpu.engine.grid import DenseGridPlan


def fold_windows_eligible(plan: DenseGridPlan, bx: int, wl: int) -> bool:
    cap = plan.cap
    wgrp = (bx + 2) * cap
    nx = plan.grid[0]
    return (
        wgrp % 128 == 0
        and wl == 9 * wgrp
        and (bx * cap) % 128 == 0
        and nx % bx == 0
    )


def _fold_kernel(bx: int, cap: int, *refs):
    in_refs = refs[:9]
    out_ref = refs[9]
    acc = None
    for g in range(9):
        seg = in_refs[g][0, 0]  # (C, nxb, wgrp)
        main = seg[:, :, cap:(bx + 1) * cap]  # lanes offset -cap
        left = seg[:, :, 0:cap]  # -> prev block, last cell
        right = seg[:, :, (bx + 1) * cap:(bx + 2) * cap]  # -> next block
        v = main
        pad = jnp.zeros(left.shape[:2] + ((bx - 1) * cap,), left.dtype)
        lplace = jnp.concatenate([pad, left], axis=2)
        rplace = jnp.concatenate([right, pad], axis=2)
        # x-block roll via static concat slices (out[i] = in[i -+ 1])
        lrolled = jnp.concatenate([lplace[:, 1:], lplace[:, :1]], axis=1)
        rrolled = jnp.concatenate([rplace[:, -1:], rplace[:, :-1]], axis=1)
        v = v + lrolled + rrolled
        acc = v if acc is None else acc + v
    out_ref[0, 0] = acc


def fold_windows_to_rows(dw, plan: DenseGridPlan, bx: int,
                         interpret: bool = False):
    """dw (nz, ny, C, nxb, wl) -> interior row sums (nz, ny, C, nx*cap).

    Exactly fold_ghost_grad_c(fold_block_windows(dw, plan, bx), plan)
    reshaped to rows (see grid.fold_ghost_grad_c for the slot view).
    """
    nx, ny, nz = plan.grid
    cap = plan.cap
    nxb = nx // bx
    c = dw.shape[2]
    wgrp = (bx + 2) * cap
    assert fold_windows_eligible(plan, bx, dw.shape[4])

    in_specs = []
    for dz in range(3):
        for dy in range(3):
            k = dz * 3 + dy

            def imap(z, y, dz=dz, dy=dy, k=k):
                return ((z - dz + 1 + nz) % nz, (y - dy + 1 + ny) % ny,
                        0, 0, k)

            in_specs.append(
                pl.BlockSpec((1, 1, c, nxb, wgrp), imap,
                             memory_space=pltpu.VMEM)
            )
    out = pl.pallas_call(
        functools.partial(_fold_kernel, bx, cap),
        grid=(nz, ny),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, c, nxb, bx * cap),
                               lambda z, y: (z, y, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, c, nxb, bx * cap), dw.dtype),
        interpret=interpret,
    )(*([dw] * 9))
    return out.reshape(nz, ny, c, nx * cap)


def fold_windows_to_slots(dw, plan: DenseGridPlan, bx: int,
                          interpret: bool = False):
    """dw -> (n_slots, C), the fold_ghost_grad_c output layout."""
    rows = fold_windows_to_rows(dw, plan, bx, interpret=interpret)
    c = rows.shape[2]
    return jnp.moveaxis(rows, 2, 0).reshape(c, -1).T
