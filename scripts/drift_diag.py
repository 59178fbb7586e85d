#!/usr/bin/env python
"""NVE drift diagnosis: isolate WHERE the f32 energy drift comes from.

The 50 ps gate run (scripts/drift_gate.py) fails at 2.6e-2 eV/atom/ns with
or without compensated integration, so the drift is not accumulator
rounding.  This script runs one short NVE leg per invocation (env-driven)
and logs the KE/PE split, total momentum, and rebin count per block, then
fits slopes — enough to distinguish:

  * heating (KE slope > 0, PE flat)      -> non-conservative force error
  * PE shift (PE slope, KE flat)         -> rebin/wrap discontinuities
  * dt-scaling                            -> discretization vs quenched field
  * skin-scaling                          -> rebin-event-driven error
  * engine=list comparison                -> compact-engine-specific or not

Env: GPUMD_DD_ENGINE=compact|list, GPUMD_DD_N, GPUMD_DD_STEPS, GPUMD_DD_DT,
GPUMD_DD_SKIN, GPUMD_DD_X64=0|1 (list only), GPUMD_DD_BLOCK.
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
if int(os.environ.get("GPUMD_DD_X64", "0")):
    jax.config.update("jax_enable_x64", True)

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

    engine = os.environ.get("GPUMD_DD_ENGINE", "compact")
    target_n = int(os.environ.get("GPUMD_DD_N", 32768))
    n_steps = int(os.environ.get("GPUMD_DD_STEPS", 10000))
    dt_fs = float(os.environ.get("GPUMD_DD_DT", 1.0))
    skin = float(os.environ.get("GPUMD_DD_SKIN", 1.5))
    block = int(os.environ.get("GPUMD_DD_BLOCK", 500))
    x64 = bool(int(os.environ.get("GPUMD_DD_X64", "0")))
    dtype = jnp.float64 if x64 else jnp.float32

    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    nep = NEP.from_file("/root/reference/examples/nep_train/nep.txt",
                        dtype=dtype)
    if tuple(nep.model.symbols) == ("Pb", "Te"):
        types = 1 - types
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box,
                       dtype=dtype, compensated=not x64)
    state = initialize_velocity(state, 300.0, seed=3)
    dt = dt_fs / TIME_UNIT_CONVERSION
    ens = NVE()

    tag = (f"{engine} n={n} dt={dt_fs} skin={skin} x64={int(x64)} "
           f"steps={n_steps}")
    print(f"# {tag}", file=sys.stderr)

    if engine == "compact":
        from gpumd_tpu.engine.dense_md import DenseNEPMD

        md = DenseNEPMD(nep, box, n, position=pos, skin=skin)
        carry = md.init_carry(state)
        carry = carry._replace(
            state=jax.jit(md.compute)(carry.state, carry.idx))
        aux = ens.init(carry.state)
        step = md.make_step(ens, dt)

        @jax.jit
        def run_block(carry, aux):
            (carry, aux), _ = jax.lax.scan(step, (carry, aux), length=block)
            return carry, aux

        def get_state(c):
            return c.state

        def ref_pos(c):
            return c.state.box.cartesian(c.ref_frac)
    else:
        from gpumd_tpu.forcefield import ForceField
        from gpumd_tpu.integrate.run import make_md_step

        mn = int(os.environ.get("GPUMD_DD_MN", 160))
        ff = ForceField.create([nep], box, n, mn=mn, skin=skin)
        state = ff.compute(state)
        cache = ff.refresh_cache(state)
        stepf = make_md_step(ff, ens, dt, observer=lambda s: 0)
        aux = ens.init(state)
        carry = (state, aux, cache)

        @jax.jit
        def run_block(carry, aux_unused):
            carry, _ = jax.lax.scan(stepf, carry, length=block)
            return carry, None

        def get_state(c):
            return c[0]

        def ref_pos(c):
            return None

    def energies(st):
        m = np.asarray(st.mask, np.float64)
        pe = np.sum(np.asarray(st.potential_energy, np.float64) * m)
        v = np.asarray(st.velocity, np.float64)
        mm = np.asarray(st.mass, np.float64) * m
        ke = 0.5 * np.sum(mm * np.sum(v * v, axis=1))
        p = np.sum(mm[:, None] * v, axis=0)
        return pe, ke, float(np.linalg.norm(p))

    rows = []
    t0 = time.time()
    last_ref = None
    rebins = 0
    done = 0
    while done < n_steps:
        out = run_block(carry, aux)
        if engine == "compact":
            carry, aux = out
            rp = np.asarray(ref_pos(carry)[:8, 0])
            if last_ref is None or not np.array_equal(rp, last_ref):
                rebins += 1
                last_ref = rp
        else:
            carry, _ = out
        done += block
        pe, ke, pnorm = energies(get_state(carry))
        rows.append((done * dt_fs * 1e-6, pe, ke, pnorm))
        print(f"# step {done}: PE={pe:.6f} KE={ke:.6f} E={pe+ke:.6f} "
              f"|P|={pnorm:.3e} rebins~{rebins} "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
    rows = np.asarray(rows)
    t_ns, pe_a, ke_a = rows[:, 0], rows[:, 1], rows[:, 2]
    k0 = max(1, len(rows) // 10)
    s_pe = np.polyfit(t_ns[k0:], pe_a[k0:], 1)[0] / n
    s_ke = np.polyfit(t_ns[k0:], ke_a[k0:], 1)[0] / n
    s_e = np.polyfit(t_ns[k0:], (pe_a + ke_a)[k0:], 1)[0] / n
    print(json.dumps({
        "tag": tag, "n": n, "dt_fs": dt_fs, "skin": skin, "engine": engine,
        "x64": x64, "sim_ps": done * dt_fs * 1e-3,
        "drift_e": s_e, "drift_pe": s_pe, "drift_ke": s_ke,
        "unit": "eV_per_atom_per_ns",
        "p_final": rows[-1, 3], "rebins_seen": rebins,
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
