#!/usr/bin/env python
"""Single-shot drift attribution: does the compact-vs-list force difference
field account for the NVE energy drift?

Thermalize STEPS steps on the compact engine, then at the final state
compute F_compact and F_list (same positions, same model) and the
instantaneous power P = sum_i (F_c - F_l) . v_i.  The observed drift
(+0.026 eV/atom/ns at 32k = +0.85 eV/ps total) corresponds to
P ~ +8.7e-3 eV/natural-time; the shot noise of a single snapshot is
~1e-4 — one snapshot decides.

Also reports total-force sums (momentum conservation) for both engines and
the RMS per-atom force difference.

Env: GPUMD_DP_N (default 32768), GPUMD_DP_STEPS (default 3000).
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
    from gpumd_tpu.forcefield import ForceField
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    target_n = int(os.environ.get("GPUMD_DP_N", 32768))
    n_steps = int(os.environ.get("GPUMD_DP_STEPS", 3000))
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
    for _ in range(n_steps // 1000):
        carry, aux = run_block(carry, aux)
    st = carry.state
    print(f"# thermalized {n_steps} steps ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    # compact force at the snapshot (recompute; identical to st.force)
    f_c = np.asarray(jax.jit(md.compute)(st, carry.idx).force, np.float64)
    e_c = np.asarray(st.potential_energy, np.float64)

    # list-path force at the SAME positions (slot order, mask-aware)
    ff = ForceField.create([nep], box, int(st.position.shape[0]),
                           mn=int(os.environ.get("GPUMD_DP_MN", 160)),
                           skin=0.0)
    sl = ff.compute(st)
    f_l = np.asarray(sl.force, np.float64)
    e_l = np.asarray(sl.potential_energy, np.float64)

    m = np.asarray(st.mask, np.float64)
    v = np.asarray(st.velocity, np.float64)
    df = (f_c - f_l) * m[:, None]
    power = float(np.sum(df * v))
    n_real = int(m.sum())

    # self-consistency: is F_compact the gradient of E_compact?  Central
    # difference along the velocity direction (same frozen idx):
    #   incons = sum F.v + dE/dh|_{x+h v}  (should be ~0 for a conservative
    #   field; ~ +8.7e-3 eV/natural-time would fully explain the drift)
    compute_j = jax.jit(md.compute)

    def e_at(h):
        sh = st._replace(position=st.position + jnp.float32(h) * st.velocity)
        out = compute_j(sh, carry.idx)
        return float(np.sum(np.asarray(out.potential_energy, np.float64)
                            * m))

    fv = float(np.sum(f_c * m[:, None] * v))
    self_incons = {}
    # h large enough that the f32 position-quantization noise (~ulp(L) per
    # coordinate) is small vs the h.v shift; Richardson across h pairs
    # cancels the O(h^2) truncation: I_true ~ (4 I(h) - I(2h)) / 3
    for h in (0.25, 0.5, 1.0):
        dedh = (e_at(h) - e_at(-h)) / (2 * h)
        self_incons[f"h={h}"] = fv + dedh
    # eV per natural time -> eV/ps: natural time = TIME_UNIT_CONVERSION fs
    to_ev_per_ps = 1000.0 / TIME_UNIT_CONVERSION
    print(json.dumps({
        "n": n_real,
        "power_eV_per_ps": power * to_ev_per_ps,
        "target_if_drift_explained_eV_per_ps": 0.026e-3 * n_real * 1e3,
        "df_rms_eV_per_A": float(np.sqrt((df**2).sum() / (3 * n_real))),
        "de_rms_eV": float(np.sqrt((((e_c - e_l) * m)**2).sum() / n_real)),
        "sumF_compact": [float(x) for x in (f_c * m[:, None]).sum(0)],
        "sumF_list": [float(x) for x in (f_l * m[:, None]).sum(0)],
        "drift_rate_eV_per_atom_per_ns_equiv":
            power * to_ev_per_ps * 1e3 / n_real,
        "sum_F_dot_v_eV_per_nat": fv,
        "self_inconsistency_eV_per_nat": self_incons,
    }))


if __name__ == "__main__":
    main()
