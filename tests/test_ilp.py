"""ILP interlayer hybrids (ref: src/force/ilp_nep.cu, ilp_tersoff.cu)."""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpumd_tpu.io.xyz import XYZFrame, write_xyz

from conftest import requires_reference

HYB = "/root/reference/potentials/hybrid_nep_ilp"


def _bilayer_graphene(tmp_path, dz=3.35, nx=3, ny=2):
    a = 1.42
    cell = np.array([[0, 0, 0], [a, 0, 0],
                     [1.5 * a, np.sqrt(3) / 2 * a, 0],
                     [2.5 * a, np.sqrt(3) / 2 * a, 0]])
    lx, ly = 3 * a, np.sqrt(3) * a
    pos = []
    for i in range(nx):
        for j in range(ny):
            pos.extend(cell + np.array([i * lx, j * ly, 0.0]))
    bottom = np.asarray(pos)
    # AB stacking shift for the top layer
    top = bottom + np.array([a, 0.0, dz])
    allpos = np.vstack([bottom, top]) + np.array([0, 0, 6.0])
    n = len(allpos)
    groups = np.array([0] * len(bottom) + [1] * len(top))[:, None]
    frame = XYZFrame(
        symbols=["C"] * n, positions=allpos,
        lattice=np.diag([nx * lx, ny * ly, dz + 24.0]),
        pbc=(True, True, False), groups=groups,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame, with_groups=True)
    return n


@pytest.fixture
def ilp_files(tmp_path):
    shutil.copy(f"{HYB}/hybrid_nep_ilp_gr_hbn_ILP_oywg_2018.txt",
                tmp_path / "ilp.txt")
    shutil.copy(f"{HYB}/bilayer_graphene_map_nep.txt", tmp_path / "map.txt")
    shutil.copy(f"{HYB}/C_2024_NEP4.txt", tmp_path / "C_2024_NEP4.txt")
    return tmp_path


@requires_reference
def test_nep_ilp_binding_curve(tmp_path, ilp_files):
    """Bilayer graphene with the published gr/hBN ILP: the interlayer
    energy has a binding minimum near 3.3-3.5 A and repulsion below."""
    from gpumd_tpu.app.gpumd import Session

    energies = {}
    for dz in (2.8, 3.4, 4.5, 7.0):
        for f in ("model.xyz",):
            pass
        _bilayer_graphene(tmp_path, dz=dz)
        (tmp_path / "run.in").write_text(
            "potential ilp.txt map.txt\ntime_step 1\n"
        )
        s = Session(str(tmp_path), quiet=True)
        s.execute()
        out = jax.jit(s.ff.compute)(s.state)
        energies[dz] = float(jnp.sum(out.potential_energy * out.mask))
    # binding: 3.4 is the minimum of the sampled points
    assert energies[3.4] < energies[4.5] < energies[7.0]
    assert energies[3.4] < energies[2.8]
    # binding energy scale: tens of meV/atom at the minimum vs 7 A
    n = _bilayer_graphene(tmp_path, dz=3.4)
    eb = (energies[7.0] - energies[3.4]) / n
    assert 0.005 < eb < 0.2, eb


@requires_reference
def test_nep_ilp_forces_match_fd(tmp_path, ilp_files):
    from gpumd_tpu.app.gpumd import Session

    _bilayer_graphene(tmp_path, dz=3.2)
    (tmp_path / "run.in").write_text(
        "potential ilp.txt map.txt\ntime_step 1\n"
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    state = s.state
    # rattle to break symmetry
    rng = np.random.default_rng(0)
    state = state._replace(
        position=state.position
        + jnp.asarray(rng.uniform(-0.05, 0.05, state.position.shape))
    )
    out = jax.jit(s.ff.compute)(state)
    f = np.asarray(out.force)

    def e_of(pos):
        o = jax.jit(s.ff.compute)(state._replace(position=pos))
        return float(jnp.sum(o.potential_energy * o.mask))

    h = 2e-4
    for i, a in [(0, 2), (5, 0), (len(f) // 2 + 1, 1)]:
        ep = e_of(state.position.at[i, a].add(h))
        em = e_of(state.position.at[i, a].add(-h))
        f_fd = -(ep - em) / (2 * h)
        assert np.isclose(f[i, a], f_fd, rtol=2e-2, atol=2e-4), (
            i, a, f[i, a], f_fd,
        )
