#!/usr/bin/env python
"""Drift localization, phase 1 (TPU): thermalize on the compact engine,
then at the final state report
  * carry.overflow  (silent mid-run tile overflow would drop pair forces —
    exactly the momentum + energy non-conservation signature)
  * sum F (momentum conservation of one force evaluation)
  * force self-consistency  sum F.v  vs  -dE/dh along v (same frozen idx)
and dump the state + compact forces to npz for the CPU x64 list-path
comparison (scripts/drift_localize_cpu.py) — the TPU list path crashes the
remote-compile helper on the virial segment_sum, so ground truth runs on
CPU.

Env: GPUMD_DL_N (default 32768), GPUMD_DL_STEPS (default 3000),
GPUMD_DL_OUT (default /tmp/drift_local.npz).
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
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    target_n = int(os.environ.get("GPUMD_DL_N", 32768))
    n_steps = int(os.environ.get("GPUMD_DL_STEPS", 3000))
    out_path = os.environ.get("GPUMD_DL_OUT", "/tmp/drift_local.npz")
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
    dt = 1.0 / TIME_UNIT_CONVERSION
    ens = NVE()

    md = DenseNEPMD(nep, box, n, position=pos, skin=1.5)
    carry = md.init_carry(state)
    carry = carry._replace(state=jax.jit(md.compute)(carry.state, carry.idx))
    aux = ens.init(carry.state)
    step = md.make_step(ens, dt)

    @jax.jit
    def run_block(carry, aux):
        (carry, aux), _ = jax.lax.scan(step, (carry, aux), length=1000)
        return carry, aux

    t0 = time.time()
    for _ in range(max(1, n_steps // 1000)):
        carry, aux = run_block(carry, aux)
    st = carry.state
    overflow = bool(carry.overflow)
    print(f"# thermalized {n_steps} steps overflow={overflow} "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)

    compute_j = jax.jit(md.compute)
    st = compute_j(st, carry.idx)
    f_c = np.asarray(st.force, np.float64)
    m = np.asarray(st.mask, np.float64)
    v = np.asarray(st.velocity, np.float64)
    n_real = int(m.sum())
    fv = float(np.sum(f_c * m[:, None] * v))

    def e_at(h):
        sh = st._replace(position=st.position + jnp.float32(h) * st.velocity)
        out = compute_j(sh, carry.idx)
        return float(np.sum(
            np.asarray(out.potential_energy, np.float64) * m))

    self_incons = {}
    for h in (0.25, 0.5, 1.0):
        dedh = (e_at(h) - e_at(-h)) / (2 * h)
        self_incons[f"h={h}"] = fv + dedh

    np.savez(
        out_path,
        position=np.asarray(st.position),
        velocity=np.asarray(st.velocity),
        mass=np.asarray(st.mass),
        type=np.asarray(st.type),
        mask=np.asarray(st.mask),
        force_c=np.asarray(st.force),
        pe_c=np.asarray(st.potential_energy),
        lengths=np.asarray(lengths),
        grid=np.asarray(md.plan.grid),
        cap=md.plan.cap,
        bx=md.cplan.bx,
    )
    print(json.dumps({
        "n": n_real,
        "overflow": overflow,
        "sumF_compact": [float(x) for x in (f_c * m[:, None]).sum(0)],
        "sum_F_dot_v_eV_per_nat": fv,
        "self_inconsistency_eV_per_nat": self_incons,
        "drift_equiv_note": "incons * 1000/TIME_UNIT / n = eV/atom/ps",
        "npz": out_path,
    }))


if __name__ == "__main__":
    main()
