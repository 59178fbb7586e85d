"""NEMD heat-source/sink ensembles.

`ensemble heat_lan T Tc dT source_group sink_group` (grouping method 0,
ref: integrate.cu:700-752, ensemble_lan.cu:60-80): Langevin thermostats at
T + dT on the source group and T - dT on the sink group; all other atoms
evolve as NVE.  Used with `compute` / `compute_shc` for NEMD thermal
conductivity (BASELINE config graphene_kappa_nemd).

`heat_bdp` applies BDP rescaling per group instead.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B


@dataclass(frozen=True)
class HeatLangevin:
    temperature: float
    coupling: float  # tau / dt
    delta_t: float
    source_mask: object  # (N,) 1.0 on source atoms
    sink_mask: object
    seed: int = 12345
    mobile: Optional[object] = None

    def init(self, state):
        return {
            "key": jax.random.PRNGKey(self.seed),
            # cumulative thermostat energy input (source, sink) for flux
            "e_transfer": jnp.zeros((2,), state.velocity.dtype),
        }

    def _kick(self, state, key, aux):
        dtype = state.velocity.dtype
        c1 = jnp.exp(-0.5 / self.coupling)
        src = jnp.asarray(self.source_mask, dtype)
        snk = jnp.asarray(self.sink_mask, dtype)
        t_src = self.temperature + self.delta_t
        t_snk = self.temperature - self.delta_t
        c2_src = jnp.sqrt((1 - c1 * c1) * K_B * t_src / state.mass).astype(dtype)
        c2_snk = jnp.sqrt((1 - c1 * c1) * K_B * t_snk / state.mass).astype(dtype)
        k1, k2 = jax.random.split(key)
        n_src = jax.random.normal(k1, state.velocity.shape, dtype)
        n_snk = jax.random.normal(k2, state.velocity.shape, dtype)
        ke_before = 0.5 * state.mass[:, None] * state.velocity**2
        v = state.velocity
        v_src = c1 * v + c2_src[:, None] * n_src
        v_snk = c1 * v + c2_snk[:, None] * n_snk
        v = jnp.where(src[:, None] > 0, v_src, jnp.where(snk[:, None] > 0, v_snk, v))
        ke_after = 0.5 * state.mass[:, None] * v**2
        de = ke_after - ke_before
        e_src = jnp.sum(de * src[:, None])
        e_snk = jnp.sum(de * snk[:, None])
        aux = {**aux, "e_transfer": aux["e_transfer"] + jnp.stack([e_src, e_snk])}
        return state._replace(velocity=v * state.mask[:, None]), aux

    def step1(self, state, aux, dt):
        key, sub = jax.random.split(aux["key"])
        aux = {**aux, "key": key}
        state, aux = self._kick(state, sub, aux)
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile)
        key, sub = jax.random.split(aux["key"])
        aux = {**aux, "key": key}
        state, aux = self._kick(state, sub, aux)
        return state, aux
