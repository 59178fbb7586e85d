#!/usr/bin/env python
"""Quick on-device correctness check: compact engine vs list path at small N.

Runs in f32 on whatever backend is active; compares energy/forces/virial.
Env: N (default 4096).
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


def main():
    n_target = int(os.environ.get("N", 4096))
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.forcefield import ForceField
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params

    nc = max(4, round((n_target / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    rng = np.random.default_rng(11)
    pos = pos + rng.uniform(-0.25, 0.25, pos.shape)  # thermal-ish jitter
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

    ff = ForceField.create([nep], box, n, mn=160, skin=1.0)
    ref = jax.jit(ff.compute)(state)
    e_ref = float(jnp.sum(ref.potential_energy * ref.mask))
    f_ref = np.asarray(ref.force)
    w_ref = np.asarray(jnp.einsum("nab,n->ab", ref.virial, ref.mask))

    for pav in (False, True):
        md = DenseNEPMD(nep, box, n, position=pos, skin=1.5,
                        per_atom_virial=pav, zero_net_force=False)
        carry = jax.jit(md.init_carry)(state)
        st = jax.jit(md.compute)(carry.state, carry.idx)
        assert not bool(carry.overflow)
        snap_f = np.zeros_like(f_ref)
        oid = np.asarray(carry.orig_id)
        m = np.asarray(carry.state.mask) > 0
        snap_f[oid[m]] = np.asarray(st.force)[m]
        e = float(jnp.sum(st.potential_energy * st.mask))
        w = np.asarray(jnp.einsum("nab,n->ab", st.virial, st.mask))
        df = np.abs(snap_f - f_ref)
        rel = np.linalg.norm(snap_f - f_ref) / max(np.linalg.norm(f_ref), 1e-30)
        print(f"pav={pav} N={n} dE={abs(e-e_ref):.3e} ({abs(e-e_ref)/abs(e_ref):.2e} rel) "
              f"max|dF|={df.max():.3e} relF={rel:.3e} "
              f"dW={np.abs(w-w_ref).max():.3e}", flush=True)
        # both sides are f32 TPU paths (neither is truth — the f64 CPU
        # oracle lives in tests/); 5e-5 rel total energy = ~2e-6 eV/atom
        # here, far inside the reference's run-to-run budget
        # (tests_pytest/conftest.py:37-52)
        assert abs(e - e_ref) / max(abs(e_ref), 1e-30) < 5e-5
        assert rel < 5e-4

    print("OK", flush=True)


if __name__ == "__main__":
    main()
