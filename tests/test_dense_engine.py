"""Dense-grid fused NEP engine vs the (golden-validated) list path.

The list path (potentials/nep/model.py + neighbor lists) is matched to the
reference's fixtures in test_nep.py; here the dense engine must reproduce
its energies, forces, and total virial on random thermal configurations —
including ZBL, multiple species, and triclinic-free orthorhombic boxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gpumd_tpu.engine.grid import apply_perm, bin_dense, pack_ghost, plan_grid
from gpumd_tpu.engine.nep_dense import dense_nep_compute, dense_nep_compute_v2
from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import NepModel, random_params


def _pbte_model(zbl=False, dtype=jnp.float64):
    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(8.0, 8.0), rc_angular=(4.0, 4.0),
        mn_radial=96, mn_angular=24, n_max_radial=6, n_max_angular=6,
        basis_size_radial=6, basis_size_angular=6, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=30,
        zbl=zbl, zbl_rc_inner=1.0 if zbl else 0.0,
        zbl_rc_outer=2.0 if zbl else 0.0,
    )
    return NEP(model=model, params=random_params(model, seed=7, dtype=dtype))


def _random_system(rng, n, lengths, a0=3.3):
    """Jittered-lattice system (keeps minimum distances physical)."""
    nx = int(np.ceil((n) ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(nx)] * 3, indexing="ij"), -1)
    pos = grid.reshape(-1, 3)[:n] * a0
    pos = pos + rng.uniform(-0.35, 0.35, pos.shape)
    pos = pos * (np.asarray(lengths) / (nx * a0))
    types = rng.integers(0, 2, n)
    return pos, types


def _list_reference(nep, pos, types, box):
    n = len(pos)
    state = make_state(pos, np.ones(n), types, box)
    ff = ForceField.create([nep], box, n, mn=256)
    out = ff.compute(state)
    w_tot = jnp.einsum("nab,n->ab", out.virial, out.mask)
    return (
        np.asarray(out.potential_energy),
        np.asarray(out.force),
        np.asarray(w_tot),
    )


def _dense(nep, pos, types, box, n, cap=None, v2=False):
    # engine contract: slot coordinates are the wrapped representatives
    # matching the cell assignment (re-established at every rebin)
    pos = np.asarray(box.wrap(jnp.asarray(pos)))
    plan = plan_grid(box, nep.model.rc_radial_max, 0.5, n, position=pos,
                     cap=cap)
    assert plan is not None
    mask = jnp.ones(n)
    perm, slot_mask, overflow = bin_dense(jnp.asarray(pos), box, mask, plan)
    assert not bool(overflow)
    pos_s = apply_perm(jnp.asarray(pos), perm, fill=1.0e5)
    types_s = apply_perm(jnp.asarray(types, dtype=jnp.int32), perm, fill=0)
    fn = dense_nep_compute_v2 if v2 else dense_nep_compute
    out = fn(
        pos_s, types_s, slot_mask, box, plan, nep.model, nep.params,
        interpret=True,
    )
    # map back to original atom order
    inv = np.full(n, -1, np.int64)
    pa = np.asarray(perm)
    valid = pa < n
    inv[pa[valid]] = np.nonzero(valid)[0]
    assert (inv >= 0).all()
    return (
        np.asarray(out.energy)[inv],
        np.asarray(out.force)[inv],
        np.asarray(out.virial_total),
    )


@pytest.mark.parametrize("v2", [False, True], ids=["v1", "v2"])
@pytest.mark.parametrize("zbl", [False, True])
def test_dense_matches_list_path(rng, zbl, v2):
    nep = _pbte_model(zbl=zbl)
    lengths = [26.0, 27.0, 28.5]
    box = Box.orthogonal(lengths)
    n = 300
    pos, types = _random_system(rng, n, lengths)
    e_ref, f_ref, w_ref = _list_reference(nep, pos, types, box)
    e, f, w = _dense(nep, pos, types, box, n, v2=v2)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(w, w_ref, rtol=1e-7, atol=1e-8)


def test_dense_nonperiodic_direction(rng):
    nep = _pbte_model()
    lengths = [26.0, 26.0, 30.0]
    box = Box.orthogonal(lengths, pbc=(True, True, False))
    n = 200
    pos, types = _random_system(rng, n, lengths)
    pos[:, 2] = pos[:, 2] * 0.9 + 1.0  # keep away from the open faces
    e_ref, f_ref, w_ref = _list_reference(nep, pos, types, box)
    e, f, w = _dense(nep, pos, types, box, n, v2=True)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(w, w_ref, rtol=1e-7, atol=1e-8)


def test_ghost_pack_fold_roundtrip(rng):
    """fold_ghost_grad is the exact adjoint of pack_ghost's position part."""
    from gpumd_tpu.engine.grid import fold_ghost_grad

    box = Box.orthogonal([27.0, 27.0, 27.0])
    n = 100
    pos, types = _random_system(rng, n, [27.0] * 3)
    plan = plan_grid(box, 8.0, 0.5, n, position=pos)
    perm, slot_mask, _ = bin_dense(jnp.asarray(pos), box, jnp.ones(n), plan)
    pos_s = apply_perm(jnp.asarray(pos), perm, fill=1.0e5)
    t_s = apply_perm(jnp.asarray(types, jnp.int32), perm, fill=0)

    def f(p):
        g = pack_ghost(p, t_s, slot_mask, box, plan)
        return jnp.sum(jnp.sin(g[:, :, :3] * 0.01))

    g_auto = jax.grad(f)(pos_s)
    garr = pack_ghost(pos_s, t_s, slot_mask, box, plan)
    dg = jnp.cos(garr[:, :, :3] * 0.01) * 0.01
    # empty slots: pack_ghost's masking zeroes their autodiff grad; the
    # engine masks them too, so compare real slots only.
    g_fold = fold_ghost_grad(dg, plan) * slot_mask[:, None]
    np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_auto),
                               atol=1e-12)


def test_dense_md_matches_list_md(rng):
    """20 NVE steps (with at least one mid-run rebin) track the list-path
    trajectory."""
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.integrate.ensembles import NVE
    from gpumd_tpu.integrate.run import md_run
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    nep = _pbte_model()
    lengths = [27.0, 27.0, 27.0]
    box = Box.orthogonal(lengths)
    n = 150
    pos, types = _random_system(rng, n, lengths)
    pos = np.asarray(box.wrap(jnp.asarray(pos)))
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, 600.0, seed=5)
    dt = 2.0 / TIME_UNIT_CONVERSION

    # list path
    ff = ForceField.create([nep], box, n, mn=256)
    s0 = ff.compute(state)
    ref, _, _ = md_run(s0, ff, NVE(), dt, 20)

    # dense path (tiny skin to force rebins mid-run)
    dmd = DenseNEPMD(nep, box, n, position=pos, skin=0.35, interpret=True)
    carry, _ = jax.jit(
        lambda st: dmd.run(st, NVE(), dt, 20), static_argnums=()
    )(state)
    assert not bool(carry.overflow)
    got = dmd.to_input_order(carry, n)

    # compare wrapped positions and velocities
    d = np.asarray(box.minimum_image(got.position - ref.position))
    assert np.abs(d).max() < 1e-6
    np.testing.assert_allclose(
        np.asarray(got.velocity), np.asarray(ref.velocity), atol=1e-7
    )
    e_ref = float(jnp.sum(ref.potential_energy * ref.mask))
    e_got = float(jnp.sum(got.potential_energy * got.mask))
    assert abs(e_ref - e_got) < 1e-6


def test_dense_md_conserves_momentum(rng):
    """zero_net_force makes the fast path conserve total momentum exactly
    (to reduction rounding): the i-/j-side halves of each pair round
    differently, and without the correction the per-step residual
    random-walks the total momentum past the reference's 1e-3 amu*A/fs
    gate (ref: tests_pytest/test_md_conservation.py:34)."""
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.integrate.ensembles import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    nep = _pbte_model()
    lengths = [27.0, 27.0, 27.0]
    box = Box.orthogonal(lengths)
    n = 150
    pos, types = _random_system(rng, n, lengths)
    pos = np.asarray(box.wrap(jnp.asarray(pos)))
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, 600.0, seed=5)
    dt = 2.0 / TIME_UNIT_CONVERSION

    dmd = DenseNEPMD(nep, box, n, position=pos, skin=0.5, interpret=True)
    carry, _ = jax.jit(lambda st: dmd.run(st, NVE(), dt, 20))(state)
    assert not bool(carry.overflow)
    got = dmd.to_input_order(carry, n)
    p0 = np.asarray(
        jnp.sum(state.velocity * state.mass[:, None] * state.mask[:, None],
                axis=0))
    p1 = np.asarray(
        jnp.sum(got.velocity * got.mass[:, None] * got.mask[:, None], axis=0))
    # initialize_velocity zeroes the linear momentum; it must stay zero
    assert np.linalg.norm(p1 - p0) < 1e-9
    assert np.linalg.norm(p1) < 1e-9


def test_engine_dense_keyword(tmp_path, rng):
    """`engine dense` routes run through DenseNEPMD and matches the list
    path (app-level integration, VERDICT round-1 item 3)."""
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.nep_input import NepTrainConfig, model_from_config
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz
    from gpumd_tpu.potentials.nep.params import (
        num_trainable, write_nep_txt,
    )

    cfg = NepTrainConfig(
        num_types=1, symbols=("Ar",), rc_radial=4.0, rc_angular=2.5,
        n_max_radial=2, n_max_angular=2, basis_size_radial=2,
        basis_size_angular=2, l_max=4, l_max_4body=0, neurons=4,
    )
    model = model_from_config(cfg)
    theta = np.random.default_rng(0).normal(0, 0.2, num_trainable(model))
    write_nep_txt(str(tmp_path / "nep.txt"), model, theta,
                  np.ones(model.dim))
    # 16 A box (>= 3 cells of rc + skin), jittered sc lattice
    npts = 5
    g = np.stack(np.meshgrid(*[np.arange(npts)] * 3, indexing="ij"), -1)
    pos = g.reshape(-1, 3) * 3.2 + np.random.default_rng(1).uniform(
        -0.2, 0.2, (npts**3, 3)
    )
    n = len(pos)
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar"] * n, positions=pos,
                 lattice=np.diag([16.0] * 3), pbc=(True, True, True)),
    )
    run = """potential nep.txt
velocity 50
time_step 2
ensemble nve
{engine}dump_thermo 2
run 6
"""
    (tmp_path / "run.in").write_text(run.format(engine="engine dense\n"))
    s1 = Session(str(tmp_path), quiet=True)
    s1.execute()
    th_dense = np.loadtxt(tmp_path / "thermo.out")
    (tmp_path / "thermo.out").unlink()
    (tmp_path / "run.in").write_text(run.format(engine=""))
    s2 = Session(str(tmp_path), quiet=True)
    s2.execute()
    th_list = np.loadtxt(tmp_path / "thermo.out")
    assert th_dense.shape == th_list.shape
    # same trajectory: temperature and PE columns agree
    np.testing.assert_allclose(th_dense[:, 0], th_list[:, 0], rtol=1e-5)
    np.testing.assert_allclose(
        th_dense[:, 2], th_list[:, 2], rtol=1e-5, atol=1e-6
    )


def test_engine_dense_hnemd(tmp_path):
    """engine dense + compute_hnemd: the compact engine's per-atom virials
    drive the homogeneous heat flow and feed kappa.out (round-2 VERDICT
    item 2: heat transport on the fast path)."""
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.nep_input import NepTrainConfig, model_from_config
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz
    from gpumd_tpu.potentials.nep.params import num_trainable, write_nep_txt

    cfg = NepTrainConfig(
        num_types=1, symbols=("Ar",), rc_radial=4.0, rc_angular=2.5,
        n_max_radial=2, n_max_angular=2, basis_size_radial=2,
        basis_size_angular=2, l_max=4, l_max_4body=0, neurons=4,
    )
    model = model_from_config(cfg)
    theta = np.random.default_rng(0).normal(0, 0.2, num_trainable(model))
    write_nep_txt(str(tmp_path / "nep.txt"), model, theta,
                  np.ones(model.dim))
    npts = 5
    g = np.stack(np.meshgrid(*[np.arange(npts)] * 3, indexing="ij"), -1)
    pos = g.reshape(-1, 3) * 3.2 + np.random.default_rng(1).uniform(
        -0.2, 0.2, (npts**3, 3)
    )
    n = len(pos)
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar"] * n, positions=pos,
                 lattice=np.diag([16.0] * 3), pbc=(True, True, True)),
    )
    (tmp_path / "run.in").write_text(
        """potential nep.txt
velocity 50
time_step 2
ensemble nvt_lan 50 50 100
engine dense
compute_hnemd 2 0.0001 0 0
run 6
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    kappa = np.loadtxt(tmp_path / "kappa.out")
    assert kappa.shape == (3, 5)
    assert np.isfinite(kappa).all()
    assert s.ff.hnemd_fe is None  # reset after the dense run

def test_engine_dense_shc_on_device(tmp_path):
    """engine dense + compute_shc: SHC correlations accumulate on device
    inside the scan (no per-step host sampling, chunk stays the thermo
    interval) and match the list path's host-sampled shc.out
    (ref: src/measure/shc.cu processes SHC per step on-GPU)."""
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.nep_input import NepTrainConfig, model_from_config
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz
    from gpumd_tpu.potentials.nep.params import num_trainable, write_nep_txt

    cfg = NepTrainConfig(
        num_types=1, symbols=("Ar",), rc_radial=4.0, rc_angular=2.5,
        n_max_radial=2, n_max_angular=2, basis_size_radial=2,
        basis_size_angular=2, l_max=4, l_max_4body=0, neurons=4,
    )
    model = model_from_config(cfg)
    theta = np.random.default_rng(0).normal(0, 0.2, num_trainable(model))
    write_nep_txt(str(tmp_path / "nep.txt"), model, theta,
                  np.ones(model.dim))
    npts = 5
    g = np.stack(np.meshgrid(*[np.arange(npts)] * 3, indexing="ij"), -1)
    pos = g.reshape(-1, 3) * 3.2 + np.random.default_rng(1).uniform(
        -0.2, 0.2, (npts**3, 3)
    )
    n = len(pos)
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar"] * n, positions=pos,
                 lattice=np.diag([16.0] * 3), pbc=(True, True, True)),
    )
    run = """potential nep.txt
velocity 50
time_step 2
ensemble nve
{engine}compute_shc 1 4 0 5 25.0
run 8
"""
    (tmp_path / "run.in").write_text(run.format(engine="engine dense\n"))
    Session(str(tmp_path), quiet=True).execute()
    shc_dense = np.loadtxt(tmp_path / "shc.out", comments="#")
    (tmp_path / "shc.out").unlink()
    (tmp_path / "run.in").write_text(run.format(engine=""))
    Session(str(tmp_path), quiet=True).execute()
    shc_list = np.loadtxt(tmp_path / "shc.out", comments="#")
    assert shc_dense.shape == shc_list.shape == (2 * 4 - 1 + 5, 3)
    scale = np.abs(shc_list[:, 1:]).max()
    np.testing.assert_allclose(
        shc_dense[:, 1:], shc_list[:, 1:], rtol=2e-4, atol=2e-4 * scale
    )
