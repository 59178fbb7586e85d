#!/usr/bin/env python
"""Isolate WHICH rebuild abort fires on the 1M bench (round-5 triage).

bench.py's validity check merges four loud-abort sources into one sticky
bool (dense_md.DenseCarry.overflow): bin cap, compact-list capacity
(cnt < cl), banded-gather membership (pair + cidx bands), and per-atom
mn_r/mn_a counts — plus NaN positions would indicate a kernel miscompile
rather than an abort.  This script runs the exact bench geometry and
prints each signal separately, at init and then per 50-step block.

Run on the TPU: python scripts/diag_overflow_1m.py [n_atoms]
Env: GPUMD_BANDED / GPUMD_COMPACT_LISTS as usual.
"""

import faulthandler
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

import jax

if os.environ.get("DIAG_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_pbte  # noqa: E402


def band_report(neigh, cplan):
    """Host-side re-check of every abort criterion on a concrete build."""
    idx = np.asarray(neigh.idx)
    cidx = np.asarray(neigh.cidx)
    cnt = np.asarray(neigh.cnt)
    cl = cplan.cl
    out = {"cnt_max": int(cnt.max()), "cl": cl,
           "cl_ok": bool(cnt.max() < cl)}
    if cplan.bands_pair:
        park = cplan.nblk_src - 1
        viol = 0
        for r, (lo, hi) in enumerate(cplan.bands_pair):
            b = idx[..., r * 8:(r + 1) * 8, :] >> 7
            bad = ~(((b >= lo) & (b <= hi)) | (b == park))
            viol += int(bad.sum())
        out["pair_band_violations"] = viol
    if cplan.bands_cidx:
        lanes = np.arange(cl)
        live = lanes[None, None, None, :] < cnt[..., None]
        viol = 0
        for o, (lo, hi) in enumerate(cplan.bands_cidx):
            b = cidx[..., o * 128:(o + 1) * 128] >> 7
            lv = live[..., o * 128:(o + 1) * 128]
            viol += int((lv & ~((b >= lo) & (b <= hi))).sum())
        out["cidx_band_violations"] = viol
    return out


def main():
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    target_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    print(f"n={n}", flush=True)

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
    dt = 1.0 / TIME_UNIT_CONVERSION

    md = DenseNEPMD(nep, box, n, position=pos, skin=1.5)
    print(f"engine={md.engine} cl={md.cplan.cl} wl={md.cplan.wl} "
          f"grid={md.cplan.base.grid} cap={md.cplan.base.cap} "
          f"bx={md.cplan.bx} mn_r={md.cplan.mn_r} mn_a={md.cplan.mn_a}",
          flush=True)

    t0 = time.time()
    carry = md.init_carry(state)
    print(f"init_carry {time.time()-t0:.1f}s overflow={bool(carry.overflow)}",
          flush=True)
    print("init build:", band_report(carry.idx, md.cplan), flush=True)
    print(f"bands_pair={md.cplan.bands_pair}", flush=True)
    print(f"bands_cidx={md.cplan.bands_cidx}", flush=True)

    st = md.compute(carry.state, carry.idx)
    f_ok = bool(jnp.isfinite(st.force).all())
    e = float(jnp.sum(st.potential_energy))
    print(f"first force finite={f_ok} E={e:.6e}", flush=True)

    ens = NVE()
    step = md.make_step(ens, dt)
    blk = int(os.environ.get("DIAG_BLOCK", "50"))
    run_block = jax.jit(
        lambda c, a: jax.lax.scan(step, (c, a), length=blk)[0])
    carry = carry._replace(state=st)
    aux = ens.init(carry.state)
    for b in range(int(os.environ.get("DIAG_BLOCKS", "10"))):
        t0 = time.time()
        carry, aux = run_block(carry, aux)
        ov = bool(carry.overflow)
        fin = bool(jnp.isfinite(carry.state.position).all())
        print(f"block {b}: {time.time()-t0:.1f}s overflow={ov} finite={fin}",
              flush=True)
        if ov or not fin:
            # re-run the rebuild eagerly on the current state to see which
            # criterion fails NOW
            neigh, ok = md._build_idx(carry.state)
            print(f"eager rebuild ok={bool(ok)}", flush=True)
            print("current build:", band_report(neigh, md.cplan), flush=True)
            break


if __name__ == "__main__":
    main()
