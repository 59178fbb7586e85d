#!/usr/bin/env python
"""Time the pieces of dense_nep_compute_v2 at a given N on TPU:
pack_ghost+pack_candidates / K1 / middle / K2 / folds.
Env: N (default 256000)."""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_pbte


def timeit(f, *a, reps=3):
    # scalar-reduce inside jit so the host sync transfers one float
    g = jax.jit(lambda *x: sum(jnp.sum(l) for l in jax.tree.leaves(f(*x))))
    s = float(np.asarray(g(*a)))
    t0 = time.time()
    for _ in range(reps):
        s += float(np.asarray(g(*a)))
    return (time.time() - t0) / reps


def main():
    n_target = int(os.environ.get("N", 256_000))
    from gpumd_tpu.engine.grid import (
        apply_perm, bin_dense, pack_candidates, plan_grid, pack_ghost,
    )
    from gpumd_tpu.engine import nep_dense as nd
    from gpumd_tpu.engine.nep_dense import (
        DenseNepSpec, k1b_call, k2b_call, middle_energy,
    )
    from gpumd_tpu.model.box import Box
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
    plan = plan_grid(box, 8.0, 1.0, n, position=pos)
    spec = DenseNepSpec.from_model(model)
    print(f"# N={n} grid={plan.grid} cap={plan.cap} slots={plan.n_slots}", flush=True)

    mask = jnp.ones(n, jnp.float32)
    posj = jnp.asarray(pos, jnp.float32)
    perm, slot_mask, _ = bin_dense(posj, box, mask, plan)
    pos_s = apply_perm(posj, perm, fill=1.0e5)
    types_s = apply_perm(jnp.asarray(types, jnp.int32), perm, fill=0)

    chunk = nd._chunk_lanes(plan.cap)
    f_pack = jax.jit(lambda p: pack_candidates(
        pack_ghost(p, types_s, slot_mask, box, plan), plan, lane_align=chunk))
    t = timeit(f_pack, pos_s)
    print(f"pack ghost+candidates: {t*1e3:.1f} ms", flush=True)
    centers, cand = jax.jit(f_pack)(pos_s)
    jax.block_until_ready(cand)
    print(f"# cand shape {cand.shape} -> grid steps "
          f"{plan.grid[2]*plan.grid[1]*plan.grid[0]*(cand.shape[-1]//chunk)}",
          flush=True)

    f_k1 = jax.jit(lambda c, w: k1b_call(c, w, plan, spec, False))
    t = timeit(f_k1, centers, cand)
    print(f"K1 fwd: {t*1e3:.1f} ms", flush=True)

    s_cat, a_cat = f_k1(centers, cand)
    jax.block_until_ready(s_cat)
    ns = plan.n_slots

    def mid(s_cat, a_cat):
        s_flat = s_cat.reshape(ns, spec.s_width)
        a_flat = jnp.moveaxis(a_cat, 3, 4).reshape(ns, spec.a_width)

        def f(sf, af):
            e = middle_energy(sf, af, types_s, model, nep.params)
            return jnp.sum(e * slot_mask)

        e, grads = jax.value_and_grad(f, argnums=(0, 1))(s_flat, a_flat)
        return e, grads

    f_mid = jax.jit(mid)
    t = timeit(f_mid, s_cat, a_cat)
    print(f"middle fwd+vjp: {t*1e3:.1f} ms", flush=True)

    _, (cot_s, cot_a) = f_mid(s_cat, a_cat)
    nx, ny, nz = plan.grid
    cap = plan.cap
    cot_s4 = cot_s.reshape(nz, ny, nx, cap, spec.s_width)
    cot_a6 = jnp.moveaxis(
        cot_a.reshape(nz, ny, nx, cap, spec.ch_a, spec.nlm), 4, 3
    ).reshape(nz, ny, nx, spec.ch_a, cap, spec.nlm)

    f_k2 = jax.jit(lambda c, w, cs, ca: k2b_call(
        c, w, cs, ca, plan, spec, False))
    t = timeit(f_k2, centers, cand, cot_s4, cot_a6)
    print(f"K2 bwd: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
