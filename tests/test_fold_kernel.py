"""Fused Pallas fold vs the XLA fold pair (grid.fold_block_windows +
fold_ghost_grad_c) on random window cotangents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.engine.fold_kernel import (
    fold_windows_eligible,
    fold_windows_to_slots,
)
from gpumd_tpu.engine.grid import (
    DenseGridPlan,
    fold_block_windows,
    fold_ghost_grad_c,
)


@pytest.mark.parametrize("bx,cap,grid", [
    (2, 64, (4, 3, 3)),
    (1, 128, (4, 4, 3)),
    (2, 128, (6, 3, 4)),
])
def test_fold_kernel_matches_xla(bx, cap, grid):
    plan = DenseGridPlan(grid=grid, cap=cap, rc=4.0, skin=1.0,
                         pbc=(True, True, True))
    nx, ny, nz = grid
    nxb = nx // bx
    wl = 9 * (bx + 2) * cap
    assert fold_windows_eligible(plan, bx, wl)
    c = 4
    rng = np.random.default_rng(0)
    dw = jnp.asarray(rng.normal(size=(nz, ny, c, nxb, wl)).astype(np.float32))

    ref = fold_ghost_grad_c(fold_block_windows(dw, plan, bx), plan)
    got = fold_windows_to_slots(dw, plan, bx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_kernel_nonperiodic_zero_ghosts():
    # with non-periodic axes the scatter writes zeros into ghost lanes
    # (FAR candidates are never neighbors); the wrapped fold must agree
    # with the XLA drop-ghosts fold on such inputs
    bx, cap, grid = 2, 64, (4, 3, 3)
    plan = DenseGridPlan(grid=grid, cap=cap, rc=4.0, skin=1.0,
                         pbc=(False, False, False))
    nx, ny, nz = grid
    nxb = nx // bx
    wl = 9 * (bx + 2) * cap
    c = 4
    rng = np.random.default_rng(1)
    dw = np.asarray(rng.normal(size=(nz, ny, c, nxb, wl)).astype(np.float32))
    # zero every window lane that maps to a ghost cell on a non-periodic axis
    wgrp = (bx + 2) * cap
    for dz in range(3):
        for dy in range(3):
            g = dz * 3 + dy
            sl = dw[:, :, :, :, g * wgrp:(g + 1) * wgrp].reshape(
                nz, ny, c, nxb, bx + 2, cap)
            # z ghosts
            if dz == 0:
                sl[0] = 0.0
            if dz == 2:
                sl[-1] = 0.0
            if dy == 0:
                sl[:, 0] = 0.0
            if dy == 2:
                sl[:, -1] = 0.0
            # x ghosts: j=0 of block 0, j=bx+1 of last block
            sl[:, :, :, 0, 0] = 0.0
            sl[:, :, :, -1, -1] = 0.0
    dw = jnp.asarray(dw)
    ref = fold_ghost_grad_c(fold_block_windows(dw, plan, bx), plan)
    got = fold_windows_to_slots(dw, plan, bx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_compact_rows_matches_windowed_compaction():
    """compact_rows_call (window-free gather from ghost-row slices) must
    equal compact_windows_call over the materialized window."""
    from gpumd_tpu.engine.nep_compact import (
        CompactPlan, compact_rows_call, compact_windows_call,
        rows_compact_eligible,
    )
    from gpumd_tpu.engine.grid import pack_block_windows

    plan = DenseGridPlan(grid=(4, 3, 3), cap=64, rc=4.0, skin=1.0,
                         pbc=(True, True, True))
    cplan = CompactPlan(base=plan, bx=2, mn_r=32, mn_a=16, cl=256)
    assert rows_compact_eligible(cplan)
    nx, ny, nz = plan.grid
    cap = plan.cap
    c = 12
    rng = np.random.default_rng(7)
    grows = jnp.asarray(rng.normal(
        size=(nz + 2, ny + 2, c, (nx + 2) * cap)).astype(np.float32))
    wl = cplan.wl
    cidx = jnp.asarray(rng.integers(
        0, wl, size=(nz, ny, cplan.nxb, cplan.cl)).astype(np.int32))

    win = pack_block_windows(grows, plan, cplan.bx, wl, far_channels=0)
    ref = compact_windows_call(win, cidx, cplan, True)
    got = compact_rows_call(grows, cidx, cplan, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0)
