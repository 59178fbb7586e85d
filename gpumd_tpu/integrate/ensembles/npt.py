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

import jax
import jax.numpy as jnp

from gpumd_tpu.integrate.ensembles.nvt import NVTBerendsen, _RampMixin
from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION


@dataclass(frozen=True)
class NPTSCR(_RampMixin):
    """NPT with stochastic cell rescaling (Bernetti-Bussi) + BDP velocity
    rescaling (ref: ensemble_npt_scr.cu:87-130, npt_utilities.cuh):
      scale_k = 1 - pc (p0 - p) + sqrt(2 pc kB T / V) xi
    with pc = 1/(tau_p 3 C) per direction (GPa convention as npt_ber)."""

    target_pressure: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # GPa
    elastic_modulus: Tuple[float, float, float] = (50.0, 50.0, 50.0)  # GPa
    tau_p: float = 1000.0
    isotropic: bool = False
    seed: int = 12345

    def _p_coupling(self):
        return tuple(
            0.0 if c > 2.0e3 else 1.0 / (self.tau_p * 3.0 * c)
            for c in self.elastic_modulus
        )

    def init(self, state):
        import jax

        return {"i": jnp.zeros((), jnp.int32), "key": jax.random.PRNGKey(self.seed)}

    def step1(self, state, aux, dt):
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        import jax

        state = velocity_verlet_step2(state, dt, self.mobile)
        key, k1, k2, k3 = jax.random.split(aux["key"], 4)
        # BDP thermostat (stochastic velocity rescaling)
        from gpumd_tpu.units import K_B

        ndeg = 3.0 * jnp.sum(state.mask)
        kk = state.kinetic_energy()
        t0 = self._temp(aux)
        sigma = 0.5 * ndeg * K_B * t0
        factor = jnp.exp(-1.0 / self.coupling)
        rr = jax.random.normal(k1, (), kk.dtype)
        # independent key: reusing k1 correlates the chi^2 and gaussian draws
        sumn = 2.0 * jax.random.gamma(k2, 0.5 * (ndeg - 1.0), dtype=kk.dtype)
        kk_new = (
            kk + (1.0 - factor) * (sigma * (sumn + rr * rr) / ndeg - kk)
            + 2.0 * rr * jnp.sqrt(kk * sigma / ndeg * (1.0 - factor) * factor)
        )
        state = state._replace(velocity=state.velocity * jnp.sqrt(kk_new / kk))

        # SCR barostat
        m = state.mask
        kin = jnp.einsum(
            "n,na,nb->ab", state.mass * m, state.velocity, state.velocity,
            precision=jax.lax.Precision.HIGHEST,
        )
        w = jnp.einsum("nab,n->ab", state.virial, m,
                   precision=jax.lax.Precision.HIGHEST)
        vol = state.box.volume
        p = (kin + w) / vol * PRESSURE_UNIT_CONVERSION
        diag = jnp.diagonal(p)
        if self.isotropic:
            diag = jnp.full((3,), jnp.trace(p) / 3.0, p.dtype)
        pc = jnp.asarray(self._p_coupling(), p.dtype)
        p0 = jnp.asarray(self.target_pressure, p.dtype)
        xi = jax.random.normal(k3, (3,), p.dtype)
        if self.isotropic:
            xi = jnp.full((3,), xi[0], p.dtype)
        kbt_gpa = K_B * t0 / vol * PRESSURE_UNIT_CONVERSION
        scale = 1.0 - pc * (p0 - diag) + jnp.sqrt(2.0 * pc * kbt_gpa) * xi
        h = state.box.h * scale[None, :]
        box = state.box.with_h(h)
        pos = state.position * scale[None, :]
        unwrapped = (
            state.unwrapped_position * scale[None, :]
            if state.unwrapped_position is not None else None
        )
        return (
            state._replace(position=pos, box=box, unwrapped_position=unwrapped),
            {"i": aux["i"] + 1, "key": key},
        )


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
            "n,na,nb->ab", state.mass * m, state.velocity, state.velocity,
            precision=jax.lax.Precision.HIGHEST,
        )
        w = jnp.einsum("nab,n->ab", state.virial, m,
                   precision=jax.lax.Precision.HIGHEST)
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