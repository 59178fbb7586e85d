#!/usr/bin/env python
"""Time the phases of the compact-tile NEP engine at a given N on TPU:
pack (ghost+centers+windows) / compaction / K1 / middle+cot / K2 /
scatter / folds / rebuild / full fused force pass / full fused MD step.

Round 5: exercises the compact-candidate path (cplan.cl > 0), the flat
channel-major middle, and the fused Pallas fold.

Env: N (default 1_000_000), REPS (default 3).
"""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_pbte


def timeit(f, *a, reps=3):
    g = jax.jit(lambda *x: sum(jnp.sum(l.astype(jnp.float32))
                               for l in jax.tree.leaves(f(*x))))
    s = float(np.asarray(g(*a)))
    t0 = time.time()
    for _ in range(reps):
        s += float(np.asarray(g(*a)))
    return (time.time() - t0) / reps


def main():
    n_target = int(os.environ.get("N", 1_000_000))
    reps = int(os.environ.get("REPS", 3))
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.engine.fold_kernel import (
        fold_windows_eligible, fold_windows_to_slots,
    )
    from gpumd_tpu.engine.grid import (
        fold_block_windows, fold_ghost_grad_c, pack_block_windows,
        pack_ghost, pack_ghost_rows,
    )
    from gpumd_tpu.engine.nep_compact import (
        CompactSpec, _lane_blocks_to_slots, _slots_to_lane_blocks,
        block_centers, build_compact_neighbors, build_indices,
        compact_rows_call, compact_windows_call, k1_call, k2_call,
        mask_compact_pads, middle_compact_flat, rows_compact_eligible,
        scatter_call,
    )
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    nc = max(2, round((n_target / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(8.0, 8.0), rc_angular=(4.0, 4.0),
        mn_radial=92, mn_angular=16, n_max_radial=6, n_max_angular=6,
        basis_size_radial=6, basis_size_angular=6, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=30,
    )
    nep = NEP(model=model, params=random_params(model, seed=1))
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, 300.0, seed=3)
    md = DenseNEPMD(nep, box, n, position=pos, skin=1.5,
                    per_atom_virial=False)
    cplan = md.cplan
    plan = md.plan
    spec = CompactSpec.from_model(model, nep.params)
    print(f"# N={n} grid={plan.grid} cap={plan.cap} bx={cplan.bx} "
          f"mn_r={cplan.mn_r} mn_a={cplan.mn_a} wl={cplan.wl} cl={cplan.cl} "
          f"a_pad={cplan.a_pad} ch={spec.ch} "
          f"fused_fold={fold_windows_eligible(plan, cplan.bx, cplan.wl)}",
          file=sys.stderr)

    carry = md.init_carry(state)
    st = carry.state
    neigh = carry.idx
    has_cl = cplan.cl > 0
    idx = neigh.idx if has_cl else neigh
    interpret = False
    rc_a = model.rc_angular_max

    def pack(p, t, m):
        g = pack_ghost(p, t, m, box, plan)
        return block_centers(g, cplan), pack_block_windows(g, plan, cplan.bx,
                                                           cplan.wl)

    t_pack = timeit(pack, st.position, st.type, st.mask, reps=reps)
    print(f"pack    {t_pack*1e3:8.1f} ms", flush=True)
    centers, cand = jax.jit(pack)(st.position, st.type, st.mask)

    rows_ok = has_cl and rows_compact_eligible(cplan)
    if rows_ok:
        def compact_pos(p, t, m):
            g = pack_ghost(p, t, m, box, plan)
            return mask_compact_pads(
                compact_rows_call(g, neigh.cidx, cplan, interpret),
                neigh.cnt)

        t_cw = timeit(compact_pos, st.position, st.type, st.mask, reps=reps)
        print(f"compact {t_cw*1e3:8.1f} ms (rows->compact, incl. ghost "
              f"pack)", flush=True)
        cand_src = jax.jit(compact_pos)(st.position, st.type, st.mask)
    elif has_cl:
        def compact_pos(w):
            return mask_compact_pads(
                compact_windows_call(w, neigh.cidx, cplan, interpret),
                neigh.cnt)

        t_cw = timeit(compact_pos, cand, reps=reps)
        print(f"compact {t_cw*1e3:8.1f} ms (position windows)", flush=True)
        cand_src = jax.jit(compact_pos)(cand)
    else:
        t_cw = 0.0
        cand_src = cand

    t_k1 = timeit(lambda c, w, i: k1_call(c, w, i, cplan, spec, interpret),
                  centers, cand_src, idx, reps=reps)
    print(f"k1      {t_k1*1e3:8.1f} ms", flush=True)
    k1, tiles = jax.jit(
        lambda c, w, i: k1_call(c, w, i, cplan, spec, interpret)
    )(centers, cand_src, idx)

    sr = spec.sr
    nsd = spec.na1 * spec.nlm

    nz, ny = plan.grid[2], plan.grid[1]
    nb = nz * ny * cplan.nxb
    a_pad = cplan.a_pad
    n_flat = nb * a_pad
    dtype = st.position.dtype
    ti_f = jax.jit(lambda t: _slots_to_lane_blocks(
        t.astype(jnp.int32), cplan, 0).reshape(n_flat))(st.type)
    mask_f = jax.jit(lambda m: _slots_to_lane_blocks(
        m, cplan, 0.0).reshape(n_flat))(st.mask)

    def middle(k1f, tf, mf):
        # mirrors compact_pipeline's flat middle (round 5)
        def mid(srad, ez, sf):
            return middle_compact_flat(srad, ez, sf, tf, mf, model,
                                       nep.params)

        e_flat, vjp_mid = jax.vjp(
            mid, k1f[:sr], k1f[sr], k1f[sr + 1:sr + 1 + nsd]
        )
        cot_sr, cot_z, cot_s = vjp_mid(jnp.ones_like(e_flat))
        ch_pad = spec.ch - (sr + 1 + nsd)
        cotc = jnp.concatenate(
            [cot_sr, cot_z[None], cot_s]
            + ([jnp.zeros((ch_pad, n_flat), dtype)] if ch_pad else []),
            axis=0,
        )
        wpad = spec.wch - (sr + 1)
        cotw_rows = jnp.concatenate(
            [cot_sr, cot_z[None]]
            + ([jnp.zeros((wpad, n_flat), dtype)] if wpad else []),
            axis=0,
        ).reshape(spec.wch, nz, ny, cplan.nxb, a_pad)
        rows = cotw_rows[..., :cplan.a]
        rows = jnp.moveaxis(rows, 0, 2).reshape(
            nz, ny, spec.wch, cplan.nxb * cplan.a)
        rows_p = pack_ghost_rows(rows, plan)
        if rows_ok:
            cotw = compact_rows_call(rows_p, neigh.cidx, cplan, interpret)
        else:
            cotw = pack_block_windows(
                rows_p, plan, cplan.bx, cplan.wl, far_channels=0,
            )
            if has_cl:
                cotw = compact_windows_call(cotw, neigh.cidx, cplan,
                                            interpret)
        e_atom = _lane_blocks_to_slots(e_flat.reshape(nb, a_pad), cplan)
        return e_atom, cotc, cotw

    t_mid = timeit(middle, k1, ti_f, mask_f, reps=reps)
    print(f"middle  {t_mid*1e3:8.1f} ms (incl. cotw pack+compact)",
          flush=True)
    _, cotc, cotw = jax.jit(middle)(k1, ti_f, mask_f)
    del k1

    t_k2 = timeit(
        lambda c, tl, i, cc, cw: k2_call(c, tl, i, cc, cw, cplan, spec,
                                         False, interpret),
        centers, tiles, idx, cotc, cotw, reps=reps)
    print(f"k2      {t_k2*1e3:8.1f} ms", flush=True)
    outf, pvals = jax.jit(
        lambda c, tl, i, cc, cw: k2_call(c, tl, i, cc, cw, cplan, spec,
                                         False, interpret)
    )(centers, tiles, idx, cotc, cotw)
    del tiles, cotc, cotw, outf

    cidx = neigh.cidx if has_cl else None
    t_scat = timeit(
        lambda p, i: scatter_call(p, i[:, :, :, :cplan.mn_a, :], cplan,
                                  interpret, cidx=cidx),
        pvals, idx, reps=reps)
    print(f"scatter {t_scat*1e3:8.1f} ms", flush=True)
    dcand = jax.jit(
        lambda p, i: scatter_call(p, i[:, :, :, :cplan.mn_a, :], cplan,
                                  interpret, cidx=cidx)
    )(pvals, idx)
    del pvals

    if fold_windows_eligible(plan, cplan.bx, cplan.wl):
        def folds(dc):
            return fold_windows_to_slots(dc, plan, cplan.bx,
                                         interpret=interpret)
    else:
        def folds(dc):
            dg = fold_block_windows(dc, plan, cplan.bx)
            return fold_ghost_grad_c(dg, plan)

    t_fold = timeit(folds, dcand, reps=reps)
    print(f"folds   {t_fold*1e3:8.1f} ms", flush=True)
    del dcand

    if has_cl:
        g = jax.jit(lambda p, t, m: pack_ghost(p, t, m, box, plan))(
            st.position, st.type, st.mask)
        t_build = timeit(
            lambda ga: build_compact_neighbors(ga, box, cplan, rc_a,
                                               interpret)[0],
            g, reps=max(1, reps - 1))
        del g
    else:
        t_build = timeit(
            lambda c, w: build_indices(c, w, cplan, rc_a)[0],
            centers, cand, reps=max(1, reps - 1))
    print(f"rebuild {t_build*1e3:8.1f} ms (amortized /~50 steps)", flush=True)
    del centers, cand, cand_src

    t_force = timeit(lambda s, i: md.compute(s, i).force, st, neigh,
                     reps=reps)
    print(f"force   {t_force*1e3:8.1f} ms (one fused force pass)", flush=True)

    dt = 1.0 / TIME_UNIT_CONVERSION
    nsteps = 10
    run = jax.jit(lambda s: md.run(s, NVE(), dt, nsteps))
    c2, _ = run(state)
    jax.block_until_ready(c2.state.position)
    t0 = time.time()
    c2, _ = run(state)
    ok = bool(jnp.isfinite(c2.state.position).all())
    t_step = (time.time() - t0) / nsteps
    assert ok and not bool(c2.overflow)

    total = t_pack + t_cw + t_k1 + t_mid + t_k2 + t_scat + t_fold
    print(f"sum     {total*1e3:8.1f} ms (separate jits)")
    print(f"step    {t_step*1e3:8.1f} ms (full fused MD step incl. "
          f"init-rebuild/{nsteps})")
    print(f"throughput {n * 1 / t_step:.3e} atom-step/s")


if __name__ == "__main__":
    main()
