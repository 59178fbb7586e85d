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
@pytest.mark.slow
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


def test_sw_silicon_basics(tmp_path):
    """Standalone SW (Si, classic 1985 parameters): cohesive energy near
    -4.34 eV/atom at the equilibrium diamond lattice and forces match FD
    (ref: ilp_tmd_sw.cu:146-165 single-element form)."""
    import jax
    import jax.numpy as jnp
    from gpumd_tpu.app.gpumd import Session

    a0 = 5.431
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.25, 0.25, 0.25], [0.75, 0.75, 0.25], [0.75, 0.25, 0.75],
        [0.25, 0.75, 0.75],
    ])
    cells = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Si"] * n, positions=pos,
        lattice=np.diag([2 * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    # classic SW Si: eps=2.1683 eV, lambda=21.0, A=7.049556277,
    # B=0.6022245584, a=1.80, gamma=1.20, sigma=2.0951, cos0=-1/3
    (tmp_path / "sw.txt").write_text(
        "sw_1985 1 Si\n"
        "2.1683 21.0 7.049556277 0.6022245584 1.80 1.20 2.0951 "
        "-0.333333333333\n"
    )
    (tmp_path / "run.in").write_text("potential sw.txt\ntime_step 1\n")
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    out = jax.jit(s.ff.compute)(s.state)
    e = float(jnp.sum(out.potential_energy * out.mask)) / n
    assert np.isclose(e, -4.3363, atol=0.02), e
    assert np.allclose(np.asarray(out.force)[:n], 0.0, atol=1e-4)

    # FD force check on a rattled configuration
    rng = np.random.default_rng(1)
    st = s.state._replace(
        position=s.state.position
        + jnp.asarray(rng.uniform(-0.1, 0.1, s.state.position.shape))
    )
    out2 = jax.jit(s.ff.compute)(st)
    f = np.asarray(out2.force)

    def e_of(p):
        o = jax.jit(s.ff.compute)(st._replace(position=p))
        return float(jnp.sum(o.potential_energy * o.mask))

    h = 1e-4
    for i, ax in [(0, 0), (7, 2)]:
        ep = e_of(st.position.at[i, ax].add(h))
        em = e_of(st.position.at[i, ax].add(-h))
        assert np.isclose(f[i, ax], -(ep - em) / (2 * h), rtol=2e-3,
                          atol=1e-5)


@requires_reference
def test_nep_ilp_multi_nep(tmp_path, ilp_files):
    """Per-group NEP dispatch (num_nep > 1, ref: ilp_nep.cu:122-375):
    two copies of the same NEP assigned to the two layers must reproduce
    the shared-NEP result exactly."""
    from gpumd_tpu.app.gpumd import Session

    _bilayer_graphene(tmp_path, dz=3.4)
    (tmp_path / "run.in").write_text("potential ilp.txt map.txt\ntime_step 1\n")
    s1 = Session(str(tmp_path), quiet=True)
    s1.execute()
    e1 = float(np.sum(np.asarray(s1.state.potential_energy)
                      * np.asarray(s1.state.mask)))
    f1 = np.asarray(s1.state.force)

    (tmp_path / "map.txt").write_text(
        "0 2 C_2024_NEP4.txt C_2024_NEP4.txt\n2\n0\n1\n"
    )
    s2 = Session(str(tmp_path), quiet=True)
    s2.execute()
    e2 = float(np.sum(np.asarray(s2.state.potential_energy)
                      * np.asarray(s2.state.mask)))
    f2 = np.asarray(s2.state.force)
    np.testing.assert_allclose(e2, e1, rtol=1e-6)
    np.testing.assert_allclose(f2, f1, rtol=1e-5, atol=1e-7)
