"""Minimizers: rattled LJ crystal relaxes back to the lattice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.minimize.minimizers import minimize_fire, minimize_sd
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.lj import LJ


def rattled_argon(rattle=0.15):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)]
    )
    pos0 = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    pos = pos0 + np.random.default_rng(3).normal(0, rattle, pos0.shape)
    n = len(pos)
    box = Box.orthogonal([2 * a0] * 3)
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    lj = LJ.from_params(1.032e-2, 3.405, 9.0)
    ff = ForceField.create([lj], box, n, mn=128)
    return state, ff, pos0


@pytest.mark.parametrize("minimizer", [minimize_sd, minimize_fire],
                         ids=["sd", "fire"])
def test_relaxes_rattled_crystal(minimizer):
    state, ff, pos0 = rattled_argon()
    e_start = float(jnp.sum(ff.compute(state).potential_energy))
    final, steps = jax.jit(
        lambda st: minimizer(ff, st, 1e-5, 2000)
    )(state)
    e_end = float(jnp.sum(final.potential_energy))
    assert e_end < e_start
    fmax = float(jnp.sqrt(jnp.max(jnp.sum(final.force**2, axis=-1))))
    assert fmax < 1e-5, fmax


def test_app_minimize_keyword(tmp_path):
    from gpumd_tpu.app.gpumd import Session
    from test_app_gpumd import make_argon_dir

    make_argon_dir(tmp_path, nc=2)
    # rattle the model file
    from gpumd_tpu.io.xyz import read_xyz, write_xyz
    import dataclasses

    f = read_xyz(str(tmp_path / "model.xyz"))
    f = dataclasses.replace(
        f, positions=f.positions + np.random.default_rng(1).normal(0, 0.1, f.positions.shape)
    )
    write_xyz(str(tmp_path / "model.xyz"), f)
    (tmp_path / "run.in").write_text(
        "potential lj.txt\nminimize fire 1.0e-4 1000\n"
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    fmax = float(jnp.sqrt(jnp.max(jnp.sum(s.state.force**2, axis=-1))))
    assert fmax < 1e-4


def test_fire_box_relax(tmp_path):
    """FIRE with box_change relaxes a compressed argon fcc cell to zero
    pressure and the known LJ lattice constant (~5.28 A at rc=9)."""
    import numpy as np

    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    a0, nc = 5.0, 3
    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    )
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar"] * n, positions=pos,
                 lattice=np.diag([nc * a0] * 3), pbc=(True, True, True)),
    )
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    (tmp_path / "run.in").write_text(
        "potential lj.txt\nminimize fire 1e-5 2000 1 1\n"
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    import jax.numpy as jnp

    vol = float(s.state.box.volume)
    w = np.asarray(
        jnp.sum(s.state.virial * s.state.mask[:, None, None], axis=0)
    )
    p_gpa = np.trace(w) / vol / 3 * 160.2176621
    assert abs(p_gpa) < 2e-4, p_gpa
    a_final = (vol / nc**3) ** (1 / 3)
    assert 5.2 < a_final < 5.35, a_final
