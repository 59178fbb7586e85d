import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
from gpumd_tpu.neighbor.neighbor import (
    build_neighbor_list,
    choose_grid,
    neighbor_brute,
    neighbor_cell_list,
)


def _reference_counts(pos, lat, rc, reps):
    """Slow numpy oracle: count image-resolved neighbors within rc."""
    n = len(pos)
    h = lat.T
    hinv = np.linalg.inv(h)
    shifts = np.array(
        [
            [i, j, k]
            for i in range(-reps[0], reps[0] + 1)
            for j in range(-reps[1], reps[1] + 1)
            for k in range(-reps[2], reps[2] + 1)
        ]
    )
    counts = np.zeros(n, dtype=int)
    for i in range(n):
        for j in range(n):
            r = pos[j] - pos[i]
            s = hinv @ r
            s -= np.round(s)
            r0 = h @ s
            for sh in shifts:
                d = np.linalg.norm(r0 + h @ sh)
                if d < rc and not (i == j and np.all(sh == 0)):
                    counts[i] += 1
    return counts


def _random_system(rng, n, lengths):
    pos = rng.uniform(0, 1, (n, 3)) * np.array(lengths)
    box = Box.orthogonal(lengths)
    mask = jnp.ones(n)
    return jnp.asarray(pos), box, mask, pos


def test_brute_matches_oracle(rng):
    pos_j, box, mask, pos = _random_system(rng, 40, [10.0, 11.0, 12.0])
    rc = 4.0
    nbr = neighbor_brute(pos_j, box, mask, rc=rc, mn=64)
    counts = _reference_counts(pos, np.diag([10.0, 11.0, 12.0]), rc, (0, 0, 0))
    assert np.array_equal(np.asarray(nbr.count), counts)
    assert not bool(nbr.overflowed())
    # every listed displacement has |r| < rc and index consistency
    m = np.asarray(nbr.mask) > 0
    d = np.linalg.norm(np.asarray(nbr.r12), axis=-1)
    assert np.all(d[m] < rc)
    assert np.all(d[~m] > 1e4)


def test_brute_small_box_images(rng):
    """Box thinner than 2*rc: neighbors via periodic images must be found."""
    lengths = [3.6, 3.6, 3.6]
    pos_j, box, mask, pos = _random_system(rng, 8, lengths)
    rc = 5.0
    reps = num_replicas_for_cutoff(box, rc)
    assert reps[0] >= 1
    nbr = neighbor_brute(pos_j, box, mask, rc=rc, mn=512, reps=reps)
    counts = _reference_counts(pos, np.diag(lengths), rc, reps)
    assert np.array_equal(np.asarray(nbr.count), counts)


def test_cell_list_matches_brute(rng):
    lengths = [30.0, 30.0, 30.0]
    n = 600
    pos_j, box, mask, pos = _random_system(rng, n, lengths)
    rc = 5.0
    grid = choose_grid(box, rc)
    assert grid == (6, 6, 6)
    cell = neighbor_cell_list(
        pos_j, box, mask, rc=rc, mn=96, grid=grid, cell_cap=32
    )
    brute = neighbor_brute(pos_j, box, mask, rc=rc, mn=96)
    assert np.array_equal(np.asarray(cell.count), np.asarray(brute.count))
    # same neighbor sets (order may differ)
    ci, bi = np.asarray(cell.idx), np.asarray(brute.idx)
    cm, bm = np.asarray(cell.mask) > 0, np.asarray(brute.mask) > 0
    for a in range(n):
        assert set(ci[a][cm[a]]) == set(bi[a][bm[a]])


def test_cell_list_nonperiodic_direction(rng):
    lengths = [30.0, 30.0, 30.0]
    n = 400
    pos = rng.uniform(0, 1, (n, 3)) * np.array(lengths)
    box = Box.orthogonal(lengths, pbc=(True, True, False))
    mask = jnp.ones(n)
    rc = 5.0
    cell = neighbor_cell_list(
        jnp.asarray(pos), box, mask, rc=rc, mn=96, grid=(6, 6, 6), cell_cap=32
    )
    brute = neighbor_brute(jnp.asarray(pos), box, mask, rc=rc, mn=96)
    assert np.array_equal(np.asarray(cell.count), np.asarray(brute.count))


def test_padding_atoms_excluded(rng):
    pos = np.zeros((10, 3))
    pos[:5] = rng.uniform(0, 8, (5, 3))
    box = Box.orthogonal([8.0, 8.0, 8.0])
    mask = jnp.asarray([1.0] * 5 + [0.0] * 5)
    nbr = neighbor_brute(jnp.asarray(pos), box, mask, rc=3.0, mn=16)
    assert np.all(np.asarray(nbr.count)[5:] == 0)
    # padded atoms never appear in any real atom's list
    m = np.asarray(nbr.mask) > 0
    assert np.all(np.asarray(nbr.idx)[m] < 5)


def test_dispatch(rng):
    pos_j, box, mask, _ = _random_system(rng, 300, [40.0, 40.0, 40.0])
    nbr = build_neighbor_list(pos_j, box, mask, rc=6.0, mn=64)
    assert nbr.idx.shape == (300, 64)


def _shift_frac_of(nbr, box, pos):
    """Integer lattice shift per pair from the image-resolved r12."""
    hin = np.linalg.inv(np.asarray(box.h))
    idx = np.asarray(nbr.idx)
    r12 = np.asarray(nbr.r12)
    raw = np.asarray(pos)[idx] - np.asarray(pos)[:, None, :]
    sc = r12 - raw
    sf = np.einsum("ka,nma->nmk", hin, sc)
    sf = np.where(np.asarray(nbr.mask)[..., None] > 0, np.round(sf), 0.0)
    return jnp.asarray(sf.astype(np.int32))


def test_reverse_map_self_image_pairs(rng):
    """Regression (ADVICE r1): boxes with edge < rc along >= 2 periodic axes
    produce i==i pairs via several image shifts; each slot's mirror must be
    the SAME atom pair with the opposite shift."""
    from gpumd_tpu.neighbor.neighbor import build_reverse_map

    lengths = [2.1, 2.3, 9.0]
    n = 6
    pos = rng.uniform(0, 1, (n, 3)) * np.array(lengths)
    box = Box.orthogonal(lengths)
    rc = 3.0
    reps = num_replicas_for_cutoff(box, rc)
    nbr = neighbor_brute(jnp.asarray(pos), box, jnp.ones(n), rc=rc, mn=128,
                         reps=reps)
    assert not bool(nbr.overflowed())
    sf = _shift_frac_of(nbr, box, pos)
    rev = np.asarray(build_reverse_map(nbr, sf))
    mn = nbr.idx.shape[1]
    idx = np.asarray(nbr.idx)
    sfn = np.asarray(sf)
    mask = np.asarray(nbr.mask) > 0
    # some self-image pairs must exist for this test to bite
    ii = np.arange(n)[:, None] == idx
    assert np.any(ii & mask)
    for i in range(n):
        for m in range(mn):
            if not mask[i, m]:
                continue
            f = rev[i, m]
            i2, m2 = f // mn, f % mn
            assert i2 == idx[i, m], (i, m, i2)
            assert idx[i2, m2] == i
            assert np.array_equal(sfn[i2, m2], -sfn[i, m])


def test_reverse_virial_matches_scatter_small_box(rng):
    """Per-atom virial from the rev-gather path == scatter path on a box
    with self-image pairs (the r1 mispairing corrupted this)."""
    from gpumd_tpu.neighbor.neighbor import build_reverse_map
    from gpumd_tpu.potentials.base import forces_virial_from_partials

    lengths = [2.1, 2.3, 9.0]
    n = 6
    pos = rng.uniform(0, 1, (n, 3)) * np.array(lengths)
    box = Box.orthogonal(lengths)
    rc = 3.0
    reps = num_replicas_for_cutoff(box, rc)
    nbr = neighbor_brute(jnp.asarray(pos), box, jnp.ones(n), rc=rc, mn=128,
                         reps=reps)
    sf = _shift_frac_of(nbr, box, pos)
    rev = build_reverse_map(nbr, sf)

    def pair_energy(r12):
        d2 = jnp.sum(r12 * r12, axis=-1)
        d = jnp.sqrt(d2)
        x = jnp.clip(d / rc, 0.0, 1.0)
        fc = jnp.where(d < rc, 0.5 * (1 + jnp.cos(jnp.pi * x)), 0.0)
        return 0.5 * jnp.sum(fc / jnp.maximum(d, 0.1), axis=-1)

    import jax

    _, vjp = jax.vjp(pair_energy, nbr.r12)
    (p,) = vjp(jnp.ones(n))
    f_scatter, w_scatter = forces_virial_from_partials(p, nbr)
    nbr_rev = nbr._replace(rev=rev)
    f_rev, w_rev = forces_virial_from_partials(p, nbr_rev)
    np.testing.assert_allclose(np.asarray(f_rev), np.asarray(f_scatter),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(w_rev), np.asarray(w_scatter),
                               atol=1e-10)
