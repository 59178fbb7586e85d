"""Hybrid MCMD: Monte Carlo type moves interleaved with MD.

run.in: `mc canonical num_steps_md num_steps_mc T_initial T_final`
        `mc sgc      ... num_types (sym mu)...`
(ref: src/mc/mc.cu:206-280, mc_ensemble_canonical.cu, mc_ensemble_sgc.cu)

Canonical: pick two atoms of different types and propose a swap;
SGC: pick one atom and propose a species change with chemical-potential
bias.  Acceptance: exp(-(dE - dmu)/kB T).  The reference evaluates a
LOCAL energy difference with a dedicated NEP energy evaluator
(nep_energy.cu); here trials run as a lax.scan with a jitted global
energy difference (exact for all potentials; local-evaluation fast path
is a planned optimization).

Writes mcmd.out rows: step, acceptance ratio[, concentrations].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B


@dataclass(frozen=True)
class MCMD:
    kind: str  # canonical | sgc
    num_steps_md: int
    num_steps_mc: int
    t_initial: float
    t_final: float
    # sgc: species type indices and chemical potentials
    sgc_types: Tuple[int, ...] = ()
    sgc_mu: Tuple[float, ...] = ()
    seed: int = 2024

    def make_trials(self, ff: ForceField):
        """Returns jitted (state, key, temperature) ->
        (state, n_accepted)."""

        def total_energy(state):
            out = ff.compute(state)
            return jnp.sum(out.potential_energy * out.mask)

        nmc = self.num_steps_mc

        if self.kind == "canonical":

            def trial(carry, _):
                state, key, t, naccept = carry
                key, k1, k2, k3 = jax.random.split(key, 4)
                n = state.type.shape[0]
                n_real = jnp.sum(state.mask).astype(jnp.int32)
                i = jax.random.randint(k1, (), 0, n_real)
                j = jax.random.randint(k2, (), 0, n_real)
                ti, tj = state.type[i], state.type[j]
                e0 = total_energy(state)
                new_types = state.type.at[i].set(tj).at[j].set(ti)
                cand = state._replace(type=new_types)
                e1 = total_energy(cand)
                de = e1 - e0
                accept = (ti != tj) & (
                    jax.random.uniform(k3, (), de.dtype)
                    < jnp.exp(-de / (K_B * t))
                )
                state = jax.tree.map(
                    lambda a, b: jnp.where(accept, a, b), cand, state
                )
                return (state, key, t, naccept + accept.astype(jnp.int32)), 0

            def run_trials(state, key, t):
                (state, key, _, na), _ = jax.lax.scan(
                    trial, (state, key, t, jnp.zeros((), jnp.int32)),
                    length=nmc,
                )
                return state, key, na

            return jax.jit(run_trials)

        elif self.kind == "sgc":
            types_arr = jnp.asarray(self.sgc_types, jnp.int32)
            mu_arr = jnp.asarray(self.sgc_mu)

            def trial(carry, _):
                state, key, t, naccept = carry
                key, k1, k2, k3 = jax.random.split(key, 4)
                n_real = jnp.sum(state.mask).astype(jnp.int32)
                i = jax.random.randint(k1, (), 0, n_real)
                ti = state.type[i]
                # candidate species uniformly among the MC-active species
                pick = jax.random.randint(k2, (), 0, len(self.sgc_types))
                tnew = types_arr[pick]
                e0 = total_energy(state)
                cand = state._replace(type=state.type.at[i].set(tnew))
                e1 = total_energy(cand)
                # dmu = mu(new) - mu(old); 0 for species not in the list
                mu_of = lambda tt: jnp.sum(
                    jnp.where(types_arr == tt, mu_arr, 0.0)
                )
                dmu = mu_of(tnew) - mu_of(ti)
                de = e1 - e0 - dmu
                accept = (tnew != ti) & (
                    jax.random.uniform(k3, (), de.dtype)
                    < jnp.exp(-de / (K_B * t))
                )
                state = jax.tree.map(
                    lambda a, b: jnp.where(accept, a, b), cand, state
                )
                return (state, key, t, naccept + accept.astype(jnp.int32)), 0

            def run_trials(state, key, t):
                (state, key, _, na), _ = jax.lax.scan(
                    trial, (state, key, t, jnp.zeros((), jnp.int32)),
                    length=nmc,
                )
                return state, key, na

            return jax.jit(run_trials)
        raise ValueError(f"unsupported mc kind {self.kind!r}")
