"""Roll-based dense cell list vs brute-force oracle."""

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box
from gpumd_tpu.neighbor.neighbor import (
    neighbor_brute,
    neighbor_cell_dense,
)


def _check_equiv(cell, brute, n):
    assert np.array_equal(np.asarray(cell.count), np.asarray(brute.count))
    ci, bi = np.asarray(cell.idx), np.asarray(brute.idx)
    cm, bm = np.asarray(cell.mask) > 0, np.asarray(brute.mask) > 0
    cr, br = np.asarray(cell.r12), np.asarray(brute.r12)
    for a in range(n):
        pairs_c = {
            (ci[a, m], round(cr[a, m, 0], 6), round(cr[a, m, 1], 6))
            for m in range(ci.shape[1]) if cm[a, m]
        }
        pairs_b = {
            (bi[a, m], round(br[a, m, 0], 6), round(br[a, m, 1], 6))
            for m in range(bi.shape[1]) if bm[a, m]
        }
        assert pairs_c == pairs_b, a


def test_dense_matches_brute_orthogonal(rng):
    lengths = [30.0, 33.0, 36.0]
    n = 500
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)) * np.array(lengths))
    box = Box.orthogonal(lengths)
    mask = jnp.ones(n)
    cell = neighbor_cell_dense(
        pos, box, mask, rc=5.0, mn=96, grid=(6, 6, 7), cell_cap=16
    )
    brute = neighbor_brute(pos, box, mask, rc=5.0, mn=96)
    assert not bool(cell.overflowed())
    _check_equiv(cell, brute, n)


def test_dense_nonperiodic_axis(rng):
    lengths = [30.0, 30.0, 30.0]
    n = 400
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)) * 30.0)
    box = Box.orthogonal(lengths, pbc=(True, False, True))
    mask = jnp.ones(n)
    cell = neighbor_cell_dense(
        pos, box, mask, rc=5.0, mn=96, grid=(6, 6, 6), cell_cap=16
    )
    brute = neighbor_brute(pos, box, mask, rc=5.0, mn=96)
    _check_equiv(cell, brute, n)


def test_dense_with_padding(rng):
    n, n_pad = 300, 384
    pos = np.zeros((n_pad, 3))
    pos[:n] = rng.uniform(0, 1, (n, 3)) * 30.0
    box = Box.orthogonal([30.0, 30.0, 30.0])
    mask = jnp.asarray([1.0] * n + [0.0] * (n_pad - n))
    cell = neighbor_cell_dense(
        jnp.asarray(pos), box, mask, rc=5.0, mn=96, grid=(6, 6, 6), cell_cap=16
    )
    brute = neighbor_brute(jnp.asarray(pos), box, mask, rc=5.0, mn=96)
    _check_equiv(cell, brute, n_pad)
    assert np.all(np.asarray(cell.count)[n:] == 0)


def test_dense_triclinic(rng):
    lat = np.array([[30.0, 0, 0], [4.0, 28.0, 0], [-3.0, 2.0, 31.0]])
    box = Box.from_lattice(lat)
    n = 400
    frac = rng.uniform(0, 1, (n, 3))
    pos = jnp.asarray(frac @ lat)
    mask = jnp.ones(n)
    cell = neighbor_cell_dense(
        pos, box, mask, rc=5.0, mn=96, grid=(5, 5, 5), cell_cap=24
    )
    brute = neighbor_brute(pos, box, mask, rc=5.0, mn=96)
    _check_equiv(cell, brute, n)


def test_cell_overflow_detected(rng):
    """cell_cap too small must be reported, not silently dropped."""
    n = 200
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)) * 18.0)
    box = Box.orthogonal([18.0, 18.0, 18.0])
    cell = neighbor_cell_dense(
        pos, box, jnp.ones(n), rc=5.0, mn=96, grid=(3, 3, 3), cell_cap=4
    )
    assert bool(cell.overflowed())
