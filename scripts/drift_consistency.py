#!/usr/bin/env python
"""Force-vs-energy consistency probe for the NVE drift hunt.

Per velocity-Verlet step, accumulate (on device, stacked to host f64):
  dpe_t = PE(x_{t+1}) - PE(x_t)
  w_t   = 0.5 * sum_i (F_t + F_{t+1}) . (x_{t+1} - x_t)   (trapezoid work)
  dke_t = KE_{t+1} - KE_t

Identities: for F exactly = -grad(PE), dpe_t + w_t = O(dt^3) per step with
ZERO mean (bounded accumulation); in velocity-Verlet dke_t = w_t exactly up
to f32 rounding.  So over many steps:
  sum(dpe + w)  drifting  -> the force field is NOT the gradient of the
                             measured PE (non-conservative inconsistency);
  sum(dke - w)  drifting  -> kinetic/integration bookkeeping bias;
  sum(dpe + dke) = total E drift (cross-check vs drift_diag).

Env: GPUMD_DC_N (default 32768), GPUMD_DC_STEPS (default 4000),
GPUMD_DC_ENGINE=compact|list.
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
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    engine = os.environ.get("GPUMD_DC_ENGINE", "compact")
    target_n = int(os.environ.get("GPUMD_DC_N", 32768))
    n_steps = int(os.environ.get("GPUMD_DC_STEPS", 4000))
    dt_fs = 1.0
    block = 1000

    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    nep = NEP.from_file("/root/reference/examples/nep_train/nep.txt",
                        dtype=jnp.float32)
    if tuple(nep.model.symbols) == ("Pb", "Te"):
        types = 1 - types
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box,
                       compensated=True)
    state = initialize_velocity(state, 300.0, seed=3)
    dt = dt_fs / TIME_UNIT_CONVERSION
    ens = NVE()

    if engine == "compact":
        from gpumd_tpu.engine.dense_md import DenseNEPMD

        md = DenseNEPMD(nep, box, n, position=pos, skin=1.5)
        carry = md.init_carry(state)
        carry = carry._replace(
            state=jax.jit(md.compute)(carry.state, carry.idx))
        aux = ens.init(carry.state)

        def compute(st, c):
            return md.compute(st, c.idx)

        def get_state(c):
            return c.state

        def set_state(c, st):
            return c._replace(state=st)
    else:
        from gpumd_tpu.forcefield import ForceField

        ff = ForceField.create([nep], box, n,
                               mn=int(os.environ.get("GPUMD_DC_MN", 160)),
                               skin=1.5)
        state = ff.compute(state)
        cache = ff.refresh_cache(state)

        class C:
            pass

        carry = (state, cache)
        aux = ens.init(state)

        def compute(st, c):
            st2, _ = ff.compute_cached(st, c[1])
            return st2

        def get_state(c):
            return c[0]

        def set_state(c, st):
            return (st, c[1])

    def pe_of(st):
        return jnp.sum(st.potential_energy * st.mask)

    def ke_of(st):
        return 0.5 * jnp.sum(
            st.mass * st.mask * jnp.sum(st.velocity**2, axis=1))

    def step(carry, _):
        c, aux = carry
        st = get_state(c)
        f_old = st.force
        x_old = st.position
        pe_old = pe_of(st)
        ke_old = ke_of(st)
        st1, aux1 = ens.step1(st, aux, dt)
        st1 = compute(st1, c)
        st2, aux2 = ens.step2(st1, aux1, dt)
        dx = st2.position - x_old
        w = 0.5 * jnp.sum(
            (f_old + st2.force) * dx * st2.mask[:, None])
        dpe = pe_of(st2) - pe_old
        dke = ke_of(st2) - ke_old
        return (set_state(c, st2), aux2), (dpe, w, dke)

    @jax.jit
    def run_block(carry, aux):
        (carry, aux), ys = jax.lax.scan(step, (carry, aux), length=block)
        return carry, aux, ys

    acc = np.zeros(3, np.float64)
    t0 = time.time()
    done = 0
    while done < n_steps:
        carry, aux, ys = run_block(carry, aux)
        done += block
        dpe, w, dke = (np.asarray(y, np.float64) for y in ys)
        acc += [dpe.sum(), w.sum(), dke.sum()]
        print(f"# step {done}: sum(dpe+w)={acc[0]+acc[1]:+.4e} "
              f"sum(dke-w)={acc[2]-acc[1]:+.4e} "
              f"sum(dpe+dke)={acc[0]+acc[2]:+.4e} eV "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
    t_ns = done * dt_fs * 1e-6
    print(json.dumps({
        "engine": engine, "n": n, "steps": done,
        "noncons_eV_per_atom_per_ns": (acc[0] + acc[1]) / n / t_ns,
        "kinetic_book_eV_per_atom_per_ns": (acc[2] - acc[1]) / n / t_ns,
        "total_drift_eV_per_atom_per_ns": (acc[0] + acc[2]) / n / t_ns,
    }))


if __name__ == "__main__":
    main()
