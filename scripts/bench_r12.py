#!/usr/bin/env python
"""Isolate the per-step hot-path pieces of the list-based NEP MD step.

Times, at N atoms with MN=112 on the real TPU:
  1. cache_r12: per-component position gathers + shift add (the r12 assembly)
  2. NEP energy+force math given r12 (vjp through per_atom_energy)
  3. reverse-partial gather + reduction (rev map lookup)
  4. the full compute_cached step for comparison
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_pbte


def timeit(f, *args, reps=3, warm=1):
    for _ in range(warm):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    n_target = int(os.environ.get("N", 256_000))
    from gpumd_tpu.forcefield import ForceField
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params

    nc = max(2, round((n_target / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    print(f"# N={n}")

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
    ff = ForceField.create([nep], box, n, mn=112, skin=1.0,
                           per_atom_virial=False)

    cache = jax.jit(ff.refresh_cache)(state)
    jax.block_until_ready(cache.idx)
    print("# cache built")

    # 1. r12 assembly
    f_r12 = jax.jit(lambda s, c: ff.cache_r12(s, c).r12)
    t = timeit(f_r12, state, cache)
    print(f"r12 assembly: {t*1e3:.1f} ms")

    nbr = jax.jit(ff.cache_r12)(state, cache)
    jax.block_until_ready(nbr.r12)
    t2 = state.type[nbr.idx]

    # 2. NEP math: energy + partials (vjp wrt r12)
    def partials(r12):
        e, vjp = jax.vjp(
            lambda r: nep.per_atom_energy(r, state.type, t2), r12
        )
        (p,) = vjp(state.mask)
        return jnp.sum(e * state.mask), p

    f_math = jax.jit(partials)
    t = timeit(f_math, nbr.r12)
    print(f"NEP math (fwd+vjp): {t*1e3:.1f} ms")

    _, p = f_math(nbr.r12)
    jax.block_until_ready(p)

    # 3. reverse gather + force reduce
    def reduce_force(p):
        pf = p.reshape(-1, 3)
        rev = nbr.rev.reshape(-1)
        out = []
        for k in range(3):
            recv = pf[:, k][rev].reshape(n, -1)
            out.append(jnp.sum(p[..., k] - recv * nbr.mask, axis=1))
        return jnp.stack(out, axis=-1)

    f_red = jax.jit(reduce_force)
    t = timeit(f_red, p)
    print(f"reverse gather + reduce: {t*1e3:.1f} ms")

    # 4. full cached step
    f_full = jax.jit(lambda s, c: ff.compute_cached(s, c)[0].force)
    t = timeit(f_full, state, cache)
    print(f"full compute_cached: {t*1e3:.1f} ms "
          f"-> {n/t/1e6:.2f} M atom-step/s equivalent")


if __name__ == "__main__":
    main()
