"""Compact-tile NEP engine (v3) vs the golden-validated list path.

Same oracle strategy as test_dense_engine.py: the list path is matched to
the reference fixtures in test_nep.py; the compact engine must reproduce
its per-atom energies, forces, total virial — and (new in v3) per-atom
virials in the Fan2015 convention (ref: src/force/potential.cu:73-113).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gpumd_tpu.engine.grid import apply_perm, bin_dense, plan_grid
from gpumd_tpu.engine.nep_compact import (
    block_centers,
    build_indices,
    compact_nep_compute,
    make_compact_plan,
    pack_block_windows,
)
from gpumd_tpu.engine.grid import pack_ghost
from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import NepModel, random_params


def _model(zbl=False, flexible=False, typewise=0.0, num_types=2,
           dtype=jnp.float64, seed=7, full=False):
    # `full` uses the PbTe-example architecture; the small variant keeps
    # interpret-mode kernel tracing fast for the parameter sweeps.
    syms = ("Te", "Pb", "S", "O")[:num_types]
    zs = (52, 82, 16, 8)[:num_types]
    nm, bs, lm = (6, 6, 4) if full else (2, 2, 2)
    model = NepModel(
        version=4, model_type=0, num_types=num_types, symbols=syms,
        atomic_numbers=zs, rc_radial=(8.0,) * num_types,
        rc_angular=(4.0,) * num_types,
        mn_radial=96, mn_angular=24, n_max_radial=nm, n_max_angular=nm,
        basis_size_radial=bs, basis_size_angular=bs, l_max=lm,
        has_q=(1, 0, 0, 0, 0, 0) if full else (0,) * 6, neurons=30,
        zbl=zbl, zbl_rc_inner=0.0 if (flexible or typewise) else
        (1.0 if zbl else 0.0),
        zbl_rc_outer=2.0 if zbl else 0.0,
        zbl_flexible=flexible, zbl_typewise_factor=typewise,
    )
    return NEP(model=model, params=random_params(model, seed=seed,
                                                 dtype=dtype))


def _random_system(rng, n, lengths, num_types=2, a0=3.3):
    nx = int(np.ceil(n ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(nx)] * 3, indexing="ij"), -1)
    pos = grid.reshape(-1, 3)[:n] * a0
    pos = pos + rng.uniform(-0.35, 0.35, pos.shape)
    pos = pos * (np.asarray(lengths) / (nx * a0))
    types = rng.integers(0, num_types, n)
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
        np.asarray(out.virial),
    )


def _compact(nep, pos, types, box, n, per_atom_virial=True, skin=0.5,
             compact_lists=False, banded=False):
    pos = np.asarray(box.wrap(jnp.asarray(pos)))
    plan = plan_grid(box, nep.model.rc_radial_max, skin, n, position=pos)
    assert plan is not None
    cplan = make_compact_plan(plan, position=pos, box=box,
                              rc_angular=nep.model.rc_angular_max,
                              compact_lists=compact_lists)
    mask = jnp.ones(n)
    perm, slot_mask, overflow = bin_dense(jnp.asarray(pos), box, mask, plan)
    assert not bool(overflow)
    pos_s = apply_perm(jnp.asarray(pos), perm, fill=1.0e5)
    types_s = apply_perm(jnp.asarray(types, dtype=jnp.int32), perm, fill=0)

    garr = pack_ghost(pos_s, types_s, slot_mask, box, plan)
    if cplan.cl:
        from gpumd_tpu.engine.nep_compact import build_compact_neighbors
        idx, ok = build_compact_neighbors(
            garr, box, cplan, nep.model.rc_angular_max, True)
        if banded:
            # measure bands on the first build, then REBUILD with the
            # banded plan so the rebuild-time band checks run too
            from gpumd_tpu.engine.nep_compact import measure_bands
            bp, bc = measure_bands(idx, cplan)
            # pair bands are not baked (fragile — measure_bands docstring);
            # the cidx bands must actually narrow some chunk's scan
            assert any(hi - lo + 1 < cplan.wl // 128 for lo, hi in bc)
            cplan = cplan._replace(bands_pair=bp, bands_cidx=bc)
            idx, ok = build_compact_neighbors(
                garr, box, cplan, nep.model.rc_angular_max, True)
            assert bool(ok), "banded rebuild flagged its own bands"
    else:
        centers = block_centers(garr, cplan)
        cand = pack_block_windows(garr, plan, cplan.bx, cplan.wl)
        idx, ok = build_indices(centers, cand, cplan,
                                nep.model.rc_angular_max)
    assert bool(ok), "neighbor cap overflow in test setup"

    out = compact_nep_compute(
        pos_s, types_s, slot_mask, box, cplan, idx,
        nep.model, nep.params, per_atom_virial=per_atom_virial,
        interpret=True, temperature=nep.temperature,
    )
    inv = np.full(n, -1, np.int64)
    pa = np.asarray(perm)
    valid = pa < n
    inv[pa[valid]] = np.nonzero(valid)[0]
    assert (inv >= 0).all()
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


@pytest.mark.parametrize("zbl", [False, True], ids=["plain", "zbl"])
def test_compact_matches_list_path(zbl):
    rng = np.random.default_rng(11)
    n = 300
    box = Box.orthogonal([27.5, 28.5, 30.0])
    pos, types = _random_system(rng, n, [27.5, 28.5, 30.0])
    # full PbTe architecture on the plain case; small on the zbl case
    nep = _model(zbl=zbl, full=not zbl)

    e_ref, f_ref, w_ref, w_atom_ref = _list_reference(nep, pos, types, box)
    e, f, w, w_atom = _compact(nep, pos, types, box, n)

    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(w, w_ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(w_atom, w_atom_ref, rtol=1e-8, atol=1e-9)


def test_compact_total_virial_mode():
    """per_atom_virial=False still gives the exact total virial."""
    rng = np.random.default_rng(3)
    n = 250
    box = Box.orthogonal([27.5, 27.5, 27.5])
    pos, types = _random_system(rng, n, [27.5, 27.5, 27.5])
    nep = _model()
    _, _, w_ref, _ = _list_reference(nep, pos, types, box)
    e, f, w, w_atom = _compact(nep, pos, types, box, n,
                               per_atom_virial=False)
    assert w_atom is None
    np.testing.assert_allclose(w, w_ref, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("variant", ["flexible", "typewise"])
def test_compact_zbl_variants(variant):
    """Flexible / typewise ZBL on the fast path (round-2 gap: VERDICT
    item 6 — the dense engine only handled universal ZBL)."""
    rng = np.random.default_rng(5)
    n = 220
    box = Box.orthogonal([27.5, 27.5, 27.5])
    pos, types = _random_system(rng, n, [27.5, 27.5, 27.5])
    nep = _model(zbl=True, flexible=(variant == "flexible"),
                 typewise=0.65 if variant == "typewise" else 0.0)
    e_ref, f_ref, w_ref, _ = _list_reference(nep, pos, types, box)
    e, f, w, _ = _compact(nep, pos, types, box, n)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-9)


def test_compact_four_species():
    rng = np.random.default_rng(9)
    n = 260
    box = Box.orthogonal([28.0, 28.0, 28.0])
    pos, types = _random_system(rng, n, [28.0, 28.0, 28.0], num_types=4)
    nep = _model(num_types=4)
    e_ref, f_ref, w_ref, _ = _list_reference(nep, pos, types, box)
    e, f, w, _ = _compact(nep, pos, types, box, n)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-9)


def test_compact_restricted_foundation_model():
    """An 89-type foundation model restricted to 6 present species runs on
    the compact engine (T in [5, 8] unroll path) and matches the FULL
    model's list-path forces (ref: nep.cu:100-395 runs foundation models
    with the full table; here NEP.restrict slices to the present set)."""
    import string

    rng = np.random.default_rng(13)
    t_full = 89
    syms = tuple(
        f"{a}{b}" for a in string.ascii_uppercase
        for b in string.ascii_lowercase
    )[:t_full]
    model = NepModel(
        version=4, model_type=0, num_types=t_full, symbols=syms,
        atomic_numbers=tuple(range(1, t_full + 1)),
        rc_radial=(8.0,) * t_full, rc_angular=(4.0,) * t_full,
        mn_radial=96, mn_angular=24, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=2, neurons=8,
        zbl=True, zbl_rc_inner=1.0, zbl_rc_outer=2.0,
    )
    nep_full = NEP(model=model, params=random_params(model, seed=3,
                                                     dtype=jnp.float64))
    present = [syms[i] for i in (4, 17, 33, 52, 68, 81)]
    n = 260
    box = Box.orthogonal([28.0, 28.0, 28.0])
    pos, tsel = _random_system(rng, n, [28.0, 28.0, 28.0], num_types=6)
    types_full = np.asarray([(4, 17, 33, 52, 68, 81)[t] for t in tsel])

    e_ref, f_ref, w_ref, _ = _list_reference(nep_full, pos, types_full, box)

    small = nep_full.restrict(present)
    assert small.model.num_types == 6
    types_small = small.remap_types(types_full, model.symbols)
    e, f, w, _ = _compact(small, pos, types_small, box, n)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(w, w_ref, rtol=1e-8, atol=1e-8)


def test_compact_temperature_model():
    """model_type 3 (nep*_temperature): the target temperature enters as
    the last descriptor channel in the middle only (ref: nep.cu:1483);
    compact engine must match the list path at the same T."""
    rng = np.random.default_rng(21)
    n = 220
    box = Box.orthogonal([27.0, 27.0, 27.0])
    pos, types = _random_system(rng, n, [27.0, 27.0, 27.0])
    base = _model()
    import dataclasses

    model3 = dataclasses.replace(base.model, model_type=3)
    nep = NEP(model=model3,
              params=random_params(model3, seed=7, dtype=jnp.float64),
              temperature=450.0)
    e_ref, f_ref, w_ref, _ = _list_reference(nep, pos, types, box)
    e, f, w, _ = _compact(nep, pos, types, box, n)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-9)


def test_compact_candidate_lists_match():
    """Round-5 compact-candidate path (cplan.cl > 0: per-block keep mask,
    fused i32 class sort, compacted gather sources, in-scatter lane
    translation) must reproduce the list path exactly like the window
    path does."""
    rng = np.random.default_rng(17)
    n = 300
    box = Box.orthogonal([27.5, 28.5, 30.0])
    pos, types = _random_system(rng, n, [27.5, 28.5, 30.0])
    nep = _model(zbl=True, full=True)

    e_ref, f_ref, w_ref, w_atom_ref = _list_reference(nep, pos, types, box)
    e, f, w, w_atom = _compact(nep, pos, types, box, n, compact_lists=True)

    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(w, w_ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(w_atom, w_atom_ref, rtol=1e-8, atol=1e-9)


def test_banded_gathers_match():
    """Round-5 banded monotone gathers (CompactPlan.bands_*: kernels scan
    only the measured source-block band per chunk, out-of-range entries
    parked on the dead last compact lane) must be numerically IDENTICAL to
    the full-scan compact path — banding only drops gather blocks the
    rebuild-time band check proves are dead."""
    rng = np.random.default_rng(23)
    n = 300
    box = Box.orthogonal([27.5, 28.5, 30.0])
    pos, types = _random_system(rng, n, [27.5, 28.5, 30.0])
    nep = _model(zbl=True, full=True)

    e0, f0, w0, wa0 = _compact(nep, pos, types, box, n, compact_lists=True)
    e, f, w, wa = _compact(nep, pos, types, box, n, compact_lists=True,
                           banded=True)

    # not bit-equal: the shorter gather-add chains change which ops XLA
    # contracts into FMAs (measured 1-ulp f64 scatter on CPU); the MATH is
    # identical — every dropped block is proven dead by the band check
    np.testing.assert_allclose(e, e0, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(f, f0, rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(w, w0, rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(wa, wa0, rtol=1e-11, atol=1e-13)


def test_band_violation_flags_overflow():
    """Bands that no longer cover the configuration must flag the rebuild
    (sticky overflow), never silently drop neighbors — same contract as a
    neighbor-cap overflow."""
    from gpumd_tpu.engine.nep_compact import (
        build_compact_neighbors,
        make_compact_plan as _mk,
        measure_bands,
    )
    rng = np.random.default_rng(29)
    n = 300
    box = Box.orthogonal([27.5, 28.5, 30.0])
    pos, types = _random_system(rng, n, [27.5, 28.5, 30.0])
    nep = _model()
    pos = np.asarray(box.wrap(jnp.asarray(pos)))
    plan = plan_grid(box, nep.model.rc_radial_max, 0.5, n, position=pos)
    cplan = _mk(plan, position=pos, box=box,
                rc_angular=nep.model.rc_angular_max, compact_lists=True)
    assert cplan.cl
    mask = jnp.ones(n)
    perm, slot_mask, _ = bin_dense(jnp.asarray(pos), box, mask, plan)
    pos_s = apply_perm(jnp.asarray(pos), perm, fill=1.0e5)
    types_s = apply_perm(jnp.asarray(types, dtype=jnp.int32), perm, fill=0)
    garr = pack_ghost(pos_s, types_s, slot_mask, box, plan)
    neigh, ok = build_compact_neighbors(
        garr, box, cplan, nep.model.rc_angular_max, True)
    assert bool(ok)
    bp, bc = measure_bands(neigh, cplan)
    assert bp == ()  # pair bands are not baked by default (fragile; see
    # measure_bands docstring) — the banded mechanism ships on cidx only
    # corrupt the cidx band of the first chunk that has live entries
    nblk_w = cplan.wl // 128
    cnt_max = int(np.asarray(neigh.cnt).max())
    bad = list(bc)
    for i, (lo, hi) in enumerate(bad):
        if i * 128 < cnt_max:  # live chunk
            far = 0 if hi == nblk_w - 1 else nblk_w - 1
            bad[i] = (far, far)  # live entries now out of band
            break
    _, ok_bad = build_compact_neighbors(
        garr, box, cplan._replace(bands_pair=bp, bands_cidx=tuple(bad)),
        nep.model.rc_angular_max, True)
    assert not bool(ok_bad)


def test_baked_bands_survive_thermal_jitter():
    """Bands baked on a PERFECT-LATTICE init build must hold under thermal
    displacement (round-5 regression: rocksalt PbTe has shell-degenerate
    neighbor counts, so chunks past the last live one collapsed to
    degenerate bands at init and the first thermally-moved rebuild
    aborted the 1M bench; measure_bands now unions neighbor chunks and
    extends the all-pad suffix)."""
    from gpumd_tpu.engine.nep_compact import (
        build_compact_neighbors,
        make_compact_plan as _mk,
        measure_bands,
    )
    a0 = 6.57
    nc = 8
    base = np.array(
        [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
         [.5, 0, 0], [0, .5, 0], [0, 0, .5], [.5, .5, .5]])
    cells = np.stack(np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3)
    pos = ((cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0)
    types = np.tile(np.array([1, 1, 1, 1, 0, 0, 0, 0]), len(cells))
    n = len(pos)
    box = Box.orthogonal([nc * a0] * 3)
    nep = _model(full=True)
    plan = plan_grid(box, nep.model.rc_radial_max, 1.5, n, position=pos)
    cplan = _mk(plan, position=pos, box=box,
                rc_angular=nep.model.rc_angular_max, compact_lists=True)
    assert cplan.cl

    def build(p):
        mask = jnp.ones(n)
        perm, slot_mask, ov = bin_dense(jnp.asarray(p), box, mask, plan)
        assert not bool(ov)
        pos_s = apply_perm(jnp.asarray(p), perm, fill=1.0e5)
        types_s = apply_perm(jnp.asarray(types, dtype=jnp.int32), perm,
                             fill=0)
        garr = pack_ghost(pos_s, types_s, slot_mask, box, plan)
        return build_compact_neighbors(
            garr, box, cplan, nep.model.rc_angular_max, True)

    neigh, ok = build(pos)
    assert bool(ok)
    bp, bc = measure_bands(neigh, cplan)
    cplan = cplan._replace(bands_pair=bp, bands_cidx=bc)
    rng = np.random.default_rng(11)
    for sigma in (0.05, 0.15):
        p2 = np.asarray(box.wrap(jnp.asarray(
            pos + rng.normal(0, sigma, pos.shape))))
        _, ok2 = build(p2)
        assert bool(ok2), f"baked bands broke at sigma={sigma}"
