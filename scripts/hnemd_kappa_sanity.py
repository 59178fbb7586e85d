#!/usr/bin/env python
"""HNEMD kappa sanity run (BASELINE config 4 physics check).

Runs homogeneous-NEMD heat transport on the reference's own trained PbTe
NEP (examples/nep_train/nep.txt) on the compact fast path with per-atom
virials, and reports the running thermal conductivity

    kappa_x = KAPPA_UNIT_CONVERSION * <J_x> / (V * T * Fe)

(ref: src/measure/hnemd_kappa.cu; J_i = W_i v_i per compute_heat.cu:18-29).
The point is a sanity VALUE — PbTe at 300 K is a low-kappa thermoelectric
(~2 W/mK experimentally; NEP models trained on the 25-config example set
land in the same order of magnitude) — not a converged production number.

Env: GPUMD_KAPPA_N (default 32768), GPUMD_KAPPA_EQ (equil steps, 2000),
GPUMD_KAPPA_STEPS (production, 20000), GPUMD_KAPPA_FE (A^-1, 1e-4).
"""

import json
import os
import sys
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_pbte
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.integrate.ensembles.nvt import NVTBDP
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.units import KAPPA_UNIT_CONVERSION, TIME_UNIT_CONVERSION

    target_n = int(os.environ.get("GPUMD_KAPPA_N", 32768))
    eq_steps = int(os.environ.get("GPUMD_KAPPA_EQ", 2000))
    n_steps = int(os.environ.get("GPUMD_KAPPA_STEPS", 20000))
    fe_x = float(os.environ.get("GPUMD_KAPPA_FE", 1.0e-4))
    temperature = 300.0

    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    nep = NEP.from_file(
        "/root/reference/examples/nep_train/nep.txt", dtype=jnp.float32)
    if tuple(nep.model.symbols) == ("Pb", "Te"):
        types = 1 - types
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, temperature, seed=7)
    dt = 1.0 / TIME_UNIT_CONVERSION
    volume = float(np.prod(lengths))

    md = DenseNEPMD(nep, box, n, position=pos, skin=1.5,
                    per_atom_virial=True)
    ens = NVTBDP(t0=temperature, t1=temperature, coupling=100.0)

    def observer(s):
        return jnp.sum(s.heat_current * s.mask[:, None], axis=0)

    def block(carry, aux, steps, step_fn):
        (carry, aux), js = jax.lax.scan(step_fn, (carry, aux), length=steps)
        return carry, aux, js

    # equilibration (no driving force)
    step_eq = md.make_step(ens, dt, observer=observer)
    run_eq = jax.jit(lambda c, a: block(c, a, eq_steps, step_eq))

    carry = md.init_carry(state)
    carry = carry._replace(state=md.compute(carry.state, carry.idx))
    aux = ens.init(carry.state)
    t0 = time.time()
    carry, aux, _ = run_eq(carry, aux)
    jax.block_until_ready(carry.state.position)
    print(f"# equilibrated {eq_steps} steps in {time.time()-t0:.1f}s",
          file=sys.stderr)

    # production with HNEMD driving, in 1000-step blocks (one monolithic
    # 20k-step scan crashed the axon TPU worker; drift_gate.py's block
    # structure is the proven pattern)
    md.hnemd_fe = (fe_x, 0.0, 0.0)
    step_prod = md.make_step(ens, dt, observer=observer)
    blk = 1000
    run_prod = jax.jit(lambda c, a: block(c, a, blk, step_prod))
    t0 = time.time()
    js_all = []
    for i in range(n_steps // blk):
        carry, aux, js = run_prod(carry, aux)
        js_all.append(np.asarray(js, dtype=np.float64))
        print(f"# block {i + 1}/{n_steps // blk}", file=sys.stderr)
    js = np.concatenate(js_all, axis=0)
    wall = time.time() - t0
    if bool(carry.overflow) or not np.isfinite(js).all():
        raise SystemExit("kappa run invalid (overflow/non-finite)")

    factor = KAPPA_UNIT_CONVERSION / (volume * temperature * fe_x)
    kappa_run = np.cumsum(js[:, 0]) / np.arange(1, len(js) + 1) * factor
    half = kappa_run[len(js) // 2]
    final = kappa_run[-1]
    print(json.dumps({
        "metric": "hnemd_kappa_pbte_300K",
        "kappa_x_W_per_mK": float(final),
        "kappa_x_half_window": float(half),
        "n_atoms": n, "steps": n_steps, "fe_per_A": fe_x,
        "throughput_atom_step_per_s": n * n_steps / wall,
    }))


if __name__ == "__main__":
    main()
