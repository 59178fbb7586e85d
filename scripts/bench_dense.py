#!/usr/bin/env python
"""Dense-engine NEP throughput probe (development tool).

Runs the fused dense-grid NEP MD engine (engine/dense_md.py) on the PbTe
benchmark system at a given N and reports atom-step/s. Used to tune the
hot path before wiring into bench.py.

Env: N (default 1_000_000), STEPS (default 20), CAP (optional), SKIN.
"""

import os
import sys
import time

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_pbte


def main():
    target_n = int(os.environ.get("N", 1_000_000))
    n_steps = int(os.environ.get("STEPS", 20))
    skin = float(os.environ.get("SKIN", 1.0))
    cap = os.environ.get("CAP")
    cap = int(cap) if cap else None

    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    print(f"# N={n} grid target, box={lengths}", file=sys.stderr)

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

    t_plan = time.time()
    md = DenseNEPMD(nep, box, n, position=pos, skin=skin, cap=cap)
    print(f"# plan: grid={md.plan.grid} cap={md.plan.cap} slots={md.plan.n_slots} "
          f"(pad {md.plan.n_slots/n:.2f}x) plan_t={time.time()-t_plan:.1f}s",
          file=sys.stderr)

    dt = 1.0 / TIME_UNIT_CONVERSION
    ens = NVE()

    run = jax.jit(lambda s: md.run(s, ens, dt, n_steps))
    t0 = time.time()
    carry, aux = run(state)
    jax.block_until_ready(carry.state.position)
    t_compile = time.time() - t0
    print(f"# compile+first run: {t_compile:.1f}s", file=sys.stderr)

    t0 = time.time()
    carry, aux = run(state)
    jax.block_until_ready(carry.state.position)
    wall = time.time() - t0
    ov = bool(carry.overflow)
    fin = bool(jnp.isfinite(carry.state.position).all())
    print(f"# overflow={ov} finite={fin}", file=sys.stderr)
    rate = n * n_steps / wall
    print(f"N={n} steps={n_steps} wall={wall:.3f}s rate={rate:.3e} atom-step/s "
          f"({rate/1e8*100:.2f}% of target)")


if __name__ == "__main__":
    main()
