"""Compact-tile Tersoff engine vs the golden-tested list path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gpumd_tpu.engine.grid import apply_perm, bin_dense, pack_ghost, plan_grid
from gpumd_tpu.engine.nep_compact import (
    block_centers,
    build_indices,
    make_compact_plan,
    pack_block_windows,
)
from gpumd_tpu.engine.tersoff_compact import (
    TersoffSpec,
    compact_tersoff_compute,
)
from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.tersoff import Tersoff1989

SI_FILE = "/root/reference/potentials/tersoff/Si_Tersoff_1989.txt"


def _si_system(rng, nc=3, a0=5.431, jitter=0.12):
    base = np.array(
        [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
         [.25, .25, .25], [.75, .75, .25], [.75, .25, .75], [.25, .75, .75]]
    )
    cells = np.stack(
        np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    pos = ((cells[:, None, :] + base[None]) * a0).reshape(-1, 3)
    pos = pos + rng.uniform(-jitter, jitter, pos.shape)
    return pos, Box.orthogonal([nc * a0] * 3)


def _compact(pot, pos, types, box, n, per_atom_virial=True, skin=0.5):
    pos = np.asarray(box.wrap(jnp.asarray(pos)))
    plan = plan_grid(box, pot.rc, skin, n, position=pos)
    assert plan is not None
    cplan = make_compact_plan(plan, position=pos, box=box, rc_angular=pot.rc)
    cplan = cplan._replace(mn_a=cplan.mn_r)
    spec = TersoffSpec.from_potential(pot)
    mask = jnp.ones(n)
    perm, slot_mask, overflow = bin_dense(jnp.asarray(pos), box, mask, plan)
    assert not bool(overflow)
    pos_s = apply_perm(jnp.asarray(pos), perm, fill=1.0e5)
    types_s = apply_perm(jnp.asarray(types, dtype=jnp.int32), perm, fill=0)
    garr = pack_ghost(pos_s, types_s, slot_mask, box, plan)
    centers = block_centers(garr, cplan)
    cand = pack_block_windows(garr, plan, cplan.bx, cplan.wl)
    idx, ok = build_indices(centers, cand, cplan, pot.rc)
    assert bool(ok)
    out = compact_tersoff_compute(
        pos_s, types_s, slot_mask, box, cplan, idx, spec,
        per_atom_virial=per_atom_virial, interpret=True,
    )
    inv = np.full(n, -1, np.int64)
    pa = np.asarray(perm)
    valid = pa < n
    inv[pa[valid]] = np.nonzero(valid)[0]
    w_atom = (
        np.asarray(out.virial_atom)[inv] if out.virial_atom is not None
        else None
    )
    return (
        np.asarray(out.energy)[inv],
        np.asarray(out.force)[inv],
        np.asarray(out.virial_total),
        w_atom,
    )


def test_tersoff_compact_matches_list():
    rng = np.random.default_rng(2)
    pos, box = _si_system(rng)
    n = len(pos)
    types = np.zeros(n, int)
    pot = Tersoff1989.from_file(SI_FILE)

    state = make_state(pos, np.full(n, 28.085), types, box)
    ff = ForceField.create([pot], box, n, mn=64)
    ref = ff.compute(state)
    w_ref = np.asarray(jnp.einsum("nab,n->ab", ref.virial, ref.mask))

    e, f, w, w_atom = _compact(pot, pos, types, box, n)
    np.testing.assert_allclose(e, np.asarray(ref.potential_energy),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(f, np.asarray(ref.force), rtol=1e-8,
                               atol=1e-9)
    np.testing.assert_allclose(w, w_ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(w_atom, np.asarray(ref.virial), rtol=1e-8,
                               atol=1e-9)


def test_tersoff_compact_md_short():
    """A few NVE steps through the CompactTersoffMD driver track the list
    path (exercises the shared carry/rebin machinery)."""
    from gpumd_tpu.engine.tersoff_compact import CompactTersoffMD
    from gpumd_tpu.integrate.ensembles import NVE
    from gpumd_tpu.integrate.run import md_run
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    rng = np.random.default_rng(4)
    pos, box = _si_system(rng, nc=3)
    n = len(pos)
    pos = np.asarray(box.wrap(jnp.asarray(pos)))
    types = np.zeros(n, int)
    pot = Tersoff1989.from_file(SI_FILE)
    state = make_state(pos, np.full(n, 28.085), types, box)
    state = initialize_velocity(state, 500.0, seed=1)
    dt = 1.0 / TIME_UNIT_CONVERSION

    ff = ForceField.create([pot], box, n, mn=64)
    s0 = ff.compute(state)
    ref, _, _ = md_run(s0, ff, NVE(), dt, 10)

    md = CompactTersoffMD(pot, box, n, position=pos, skin=0.4,
                          interpret=True)
    carry, _ = jax.jit(lambda st: md.run(st, NVE(), dt, 10))(state)
    assert not bool(carry.overflow)
    got = md.to_input_order(carry, n)
    d = np.asarray(box.minimum_image(got.position - ref.position))
    assert np.abs(d).max() < 1e-8
    e_ref = float(jnp.sum(ref.potential_energy * ref.mask))
    e_got = float(jnp.sum(got.potential_energy * got.mask))
    assert abs(e_ref - e_got) < 1e-8


def test_engine_dense_tersoff_hnemd_shc(tmp_path):
    """engine dense + Tersoff + compute_hnemd/compute_shc (round-5 VERDICT
    item 3: BASELINE config 4's graphene-Tersoff HNEMD+SHC deck must ride
    the compact fast path).  The kernel's scattered pair cotangents carry
    the Fan2015 per-atom virial; the driver adds the homogeneous driving
    force and the heat-current observable."""
    import shutil

    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    rng = np.random.default_rng(9)
    pos, box = _si_system(rng, nc=3)
    n = len(pos)
    shutil.copy(SI_FILE, tmp_path / "Si_Tersoff_1989.txt")
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Si"] * n, positions=pos,
                 lattice=np.asarray(box.h).T, pbc=(True, True, True)),
    )
    (tmp_path / "run.in").write_text(
        """potential Si_Tersoff_1989.txt
velocity 300
time_step 1
ensemble nvt_lan 300 300 100
engine dense
compute_hnemd 2 0 0 0.00001
compute_shc 2 10 2 5 400
run 8
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    kappa = np.loadtxt(tmp_path / "kappa.out")
    assert kappa.shape == (4, 5)
    assert np.isfinite(kappa).all()
    shc = np.loadtxt(tmp_path / "shc.out")
    assert np.isfinite(shc).all()
    assert s.ff.hnemd_fe is None  # reset after the dense run


def test_tersoff_compact_thin_sheet():
    """Non-periodic thin dimensions get a single grid cell (round 5):
    BASELINE config 4's graphene sheet (pbc T T F, Lz = 3.35 A) must run
    on the compact engine and match the list path."""
    from gpumd_tpu.io.xyz import read_xyz_frames

    pot = Tersoff1989.from_file(
        "/root/reference/potentials/tersoff/"
        "Graphene_Lindsay_2010_modified.txt")
    # small graphene patch: honeycomb rows (from the reference generator's
    # geometry), periodic x/y, free z
    a_cc = 1.42
    nx_c, ny_c = 8, 5
    lx = nx_c * np.sqrt(3.0) * a_cc
    ly = ny_c * 3.0 * a_cc
    pts = []
    for i in range(nx_c):
        for j in range(ny_c):
            x0 = i * np.sqrt(3.0) * a_cc
            y0 = j * 3.0 * a_cc
            pts += [
                [x0 + np.sqrt(3.0) / 2 * a_cc, y0, 0.0],
                [x0, y0 + 0.5 * a_cc, 0.0],
                [x0, y0 + 1.5 * a_cc, 0.0],
                [x0 + np.sqrt(3.0) / 2 * a_cc, y0 + 2.0 * a_cc, 0.0],
            ]
    pos = np.asarray(pts)
    rng = np.random.default_rng(3)
    pos = pos + rng.uniform(-0.05, 0.05, pos.shape)
    n = len(pos)
    box = Box.orthogonal([lx, ly, 3.35], pbc=(True, True, False))

    state = make_state(pos, np.full(n, 12.011), np.zeros(n, int), box)
    ff = ForceField.create([pot], box, n, mn=24)
    ref = ff.compute(state)
    w_ref = np.asarray(jnp.einsum("nab,n->ab", ref.virial, ref.mask))

    e, f, w, w_atom = _compact(pot, pos, np.zeros(n, int), box, n)
    np.testing.assert_allclose(e, np.asarray(ref.potential_energy),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(f, np.asarray(ref.force), rtol=1e-8,
                               atol=1e-9)
    np.testing.assert_allclose(w_atom, np.asarray(ref.virial), rtol=1e-8,
                               atol=1e-9)
