#!/usr/bin/env python
"""Compare neighbor-rebuild formulations at 1M scale on TPU.

The compact engine's rebuild (build_indices) argsorts per-window f32
distance keys: (nb_rows, a_pad, wl) -> top mn_r.  Measured 2.4 s at 1M
(round-4 profile), far above the VPU roofline for a bitonic pass, because
XLA's argsort carries a (f32 key, i32 index) pair through every
compare-exchange.  The kernels only need:
  * all lanes with d2 < rca2 first (angular prefix),
  * then lanes with d2 < rcut2,
  * counts of both (overflow check);
order WITHIN a class is irrelevant — a 2-bit class partition, not a sort.
Variant "fused" packs (class << 12 | lane) into ONE i32 and sorts that:
half the data movement per compare-exchange, payload rides in the key.

Env: N (default 1M), REPS.
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
    from gpumd_tpu.engine.grid import pack_block_windows, pack_ghost
    from gpumd_tpu.engine.nep_compact import block_centers, build_indices
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params

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
    md = DenseNEPMD(nep, box, n, position=pos, skin=1.5)
    cplan, plan = md.cplan, md.plan
    print(f"# grid={plan.grid} cap={plan.cap} bx={cplan.bx} wl={cplan.wl} "
          f"mn_r={cplan.mn_r} mn_a={cplan.mn_a}", file=sys.stderr, flush=True)

    carry = md.init_carry(state)
    st = carry.state
    g = jax.jit(lambda p, t, m: pack_ghost(p, t, m, box, plan))(
        st.position, st.type, st.mask)
    centers = jax.jit(lambda g: block_centers(g, cplan))(g)
    cand = jax.jit(
        lambda g: pack_block_windows(g, plan, cplan.bx, cplan.wl))(g)

    rcut2 = (plan.rc + plan.skin) ** 2
    rca2 = (model.rc_angular_max + plan.skin) ** 2
    nz = plan.grid[2]
    _EPS2 = 1.0e-6
    _BIG = 1.0e30

    t0 = timeit(lambda c, w: build_indices(c, w, cplan, model.rc_angular_max)[0],
                centers, cand, reps=reps)
    print(f"current argsort   {t0*1e3:8.1f} ms", flush=True)

    def d2_of(c, w):
        d2 = None
        for k in range(3):
            diff = w[..., k, None, :] - c[..., k, :, None]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        return d2

    def fused_sort(c_all, w_all):
        def slab(z):
            c = jax.lax.dynamic_slice_in_dim(c_all, z, 1, 0)[0]
            w = jax.lax.dynamic_slice_in_dim(w_all, z, 1, 0)[0]
            d2 = d2_of(c, w)
            live = d2 > _EPS2
            cls = jnp.where(live & (d2 < rca2), 0,
                            jnp.where(live & (d2 < rcut2), 1, 2))
            lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
            key = (cls << 12) | lane
            skey = jnp.sort(key, axis=-1)[..., :cplan.mn_r]
            idx = (skey & 0xFFF).astype(jnp.int32)
            cnt_a = jnp.sum(cls == 0, axis=-1)
            cnt_r = cnt_a + jnp.sum(cls == 1, axis=-1)
            ok = (jnp.max(cnt_r) <= cplan.mn_r) & (jnp.max(cnt_a) <= cplan.mn_a)
            return jnp.moveaxis(idx, -1, -2), ok

        idx, oks = jax.lax.map(slab, jnp.arange(nz))
        return idx, jnp.all(oks)

    t1 = timeit(lambda c, w: fused_sort(c, w)[0], centers, cand, reps=reps)
    print(f"fused i32 sort    {t1*1e3:8.1f} ms", flush=True)

    def topk_neg(c_all, w_all):
        def slab(z):
            c = jax.lax.dynamic_slice_in_dim(c_all, z, 1, 0)[0]
            w = jax.lax.dynamic_slice_in_dim(w_all, z, 1, 0)[0]
            d2 = d2_of(c, w)
            live = d2 > _EPS2
            cls = jnp.where(live & (d2 < rca2), 0,
                            jnp.where(live & (d2 < rcut2), 1, 2))
            lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
            key = (cls << 12) | lane
            skey, _ = jax.lax.top_k(-key, cplan.mn_r)
            return jnp.moveaxis((-skey) & 0xFFF, -1, -2)

        return jax.lax.map(slab, jnp.arange(nz))

    t2 = timeit(topk_neg, centers, cand, reps=reps)
    print(f"top_k fused       {t2*1e3:8.1f} ms", flush=True)

    # correctness (sliced to one z-slab to stay in memory): fused variant
    # must select the same lane SET per class as the argsort
    c1 = centers[:1]
    w1 = cand[:1]
    idx0, ok0 = jax.jit(
        lambda c, w: build_indices(c, w, cplan, model.rc_angular_max))(c1, w1)
    idx1, ok1 = jax.jit(fused_sort)(c1, w1)
    d2 = np.moveaxis(np.asarray(jax.jit(d2_of)(c1[0], w1[0])), -2, -1)
    i0 = np.moveaxis(np.asarray(idx0[0]), -2, -1)
    i1 = np.moveaxis(np.asarray(idx1[0]), -2, -1)
    take = np.take_along_axis
    r0 = take(d2, i0, axis=-1)
    r1 = take(d2, i1, axis=-1)
    in0 = np.sort(np.where(r0 < rcut2, i0, -1), axis=-1)
    in1 = np.sort(np.where(r1 < rcut2, i1, -1), axis=-1)
    assert bool(ok0) and bool(ok1)
    assert (in0 == in1).all(), "fused sort selects a different in-range set"
    a0 = np.sort(np.where(r0 < rca2, i0, -1), axis=-1)
    a1 = np.sort(np.where(r1 < rca2, i1, -1), axis=-1)
    assert (a0 == a1).all()
    # prefix property: every angular lane within the first mn_a entries
    assert (np.where(r1 < rca2)[-1] < cplan.mn_a).all()
    print("# correctness OK", flush=True)


if __name__ == "__main__":
    main()
