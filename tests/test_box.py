import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box, num_replicas_for_cutoff


def test_orthogonal_volume_thickness():
    box = Box.orthogonal([10.0, 20.0, 30.0])
    assert np.isclose(float(box.volume), 6000.0)
    assert np.allclose(np.asarray(box.thickness()), [10.0, 20.0, 30.0])


def test_triclinic_from_lattice_row_major():
    lat = np.array([[10.0, 0, 0], [2.0, 9.0, 0], [1.0, 1.0, 8.0]])
    box = Box.from_lattice(lat)
    # columns of h are the lattice vectors
    assert np.allclose(np.asarray(box.h[:, 1]), [2.0, 9.0, 0.0])
    assert np.isclose(float(box.volume), abs(np.linalg.det(lat)))


def test_minimum_image_orthogonal():
    box = Box.orthogonal([10.0, 10.0, 10.0])
    r = jnp.array([[6.0, -6.0, 4.9]])
    out = np.asarray(box.minimum_image(r))
    assert np.allclose(out, [[-4.0, 4.0, 4.9]])


def test_minimum_image_respects_pbc_flags():
    box = Box.orthogonal([10.0, 10.0, 10.0], pbc=(True, False, True))
    r = jnp.array([[6.0, 6.0, 6.0]])
    out = np.asarray(box.minimum_image(r))
    assert np.allclose(out, [[-4.0, 6.0, -4.0]])


def test_wrap():
    box = Box.orthogonal([10.0, 10.0, 10.0])
    pos = jnp.array([[11.0, -1.0, 5.0]])
    out = np.asarray(box.wrap(pos))
    assert np.allclose(out, [[1.0, 9.0, 5.0]])


def test_minimum_image_triclinic_matches_bruteforce():
    rng = np.random.default_rng(0)
    lat = np.array([[8.0, 0, 0], [3.0, 7.0, 0], [-2.0, 1.5, 9.0]])
    box = Box.from_lattice(lat)
    r = rng.uniform(-15, 15, size=(50, 3))
    out = np.asarray(box.minimum_image(jnp.asarray(r)))
    # reference algorithm (box.cuh apply_mic): fractional round()
    h = lat.T
    s = r @ np.linalg.inv(h).T
    expected = (s - np.round(s)) @ h.T
    assert np.allclose(out, expected, atol=1e-12)


def test_num_replicas():
    box = Box.orthogonal([20.0, 20.0, 20.0])
    assert num_replicas_for_cutoff(box, 8.0) == (0, 0, 0)
    small = Box.orthogonal([3.0, 3.0, 3.0])
    # rc/t + 1/2 = 8/3 + .5 -> ceil(3.166)-1 = 3
    assert num_replicas_for_cutoff(small, 8.0) == (3, 3, 3)
    slab = Box.orthogonal([3.0, 30.0, 30.0], pbc=(True, True, False))
    assert num_replicas_for_cutoff(slab, 8.0)[1:] == (0, 0)
