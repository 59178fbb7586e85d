"""NPT ensembles (Berendsen weak coupling; SCR/MTTK arrive later).

run.in convention (ref: src/integrate/integrate.cu:614-700):
  ensemble npt_ber T1 T2 Tc  p_iso           C  tau_p          (isotropic)
  ensemble npt_ber T1 T2 Tc  px py pz  Cx Cy Cz  tau_p         (orthogonal)
Pressures and elastic moduli C in GPa; the coupling applied per step is
  p_coupling = 1 / (tau_p * 3 * C)         [GPa^-1]
  scale_k    = 1 - p_coupling * (p0_k - p_k)
with positions and box scaled together (ref: ensemble_ber.cu:95-150).
Moduli > 2000 GPa disable that direction (reference behavior).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from gpumd_tpu.integrate.ensembles.nvt import NVTBerendsen, _RampMixin
from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION


@dataclass(frozen=True)
class NPTBerendsen(_RampMixin):
    """Berendsen NPT: NVT-Berendsen thermostat + per-direction box rescale."""

    target_pressure: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # GPa
    elastic_modulus: Tuple[float, float, float] = (50.0, 50.0, 50.0)  # GPa
    tau_p: float = 1000.0
    isotropic: bool = False

    def _p_coupling(self):
        return tuple(
            0.0 if c > 2.0e3 else 1.0 / (self.tau_p * 3.0 * c)
            for c in self.elastic_modulus
        )

    def init(self, state):
        return {"i": jnp.zeros((), jnp.int32)}

    def step1(self, state, aux, dt):
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile)
        # thermostat
        t_now = state.temperature()
        t0 = self._temp(aux)
        tf = jnp.sqrt(1.0 + (t0 / t_now - 1.0) / self.coupling)
        tf = jnp.where(jnp.isfinite(tf), tf, 1.0)
        state = state._replace(velocity=state.velocity * tf)

        # barostat: instantaneous pressure (GPa)
        m = state.mask
        kin = jnp.einsum(
            "n,na,nb->ab", state.mass * m, state.velocity, state.velocity
        )
        w = jnp.einsum("nab,n->ab", state.virial, m)
        p = (kin + w) / state.box.volume * PRESSURE_UNIT_CONVERSION
        diag = jnp.diagonal(p)
        if self.isotropic:
            diag = jnp.full((3,), jnp.trace(p) / 3.0, p.dtype)
        pc = jnp.asarray(self._p_coupling(), p.dtype)
        p0 = jnp.asarray(self.target_pressure, p.dtype)
        scale = 1.0 - pc * (p0 - diag)
        # scale box and positions (and the cached reference frame follows
        # through the displacement trigger)
        h = state.box.h * scale[None, :]  # columns are lattice vectors
        box = state.box.with_h(h)
        pos = state.position * scale[None, :]
        unwrapped = (
            state.unwrapped_position * scale[None, :]
            if state.unwrapped_position is not None
            else None
        )
        return (
            state._replace(position=pos, box=box, unwrapped_position=unwrapped),
            {"i": aux["i"] + 1},
        )