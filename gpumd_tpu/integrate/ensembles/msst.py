"""MSST: multi-scale shock technique (Reed et al. PRL 90, 235503).

(ref: src/integrate/ensemble_msst.cu:1-362) The cell length along the shock
direction is a dynamical variable with inertia `qmass`, damped by `mu`,
driven by the Rayleigh-line imbalance; particle velocities get an extra
drag coupled to the volume motion.  run.in:

  ensemble msst x|y|z <vs_km_s> [qmass q] [mu m] [tscale f] [p0 P] [v0 V] [e0 E]

All reference quantities (v0/e0/p0) default to the initial state's values.
The whole update (the two-pass velocity-sum predictor of the reference,
implemented there with a device memcpy backup) is pure function composition
here — no state copies.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from gpumd_tpu.integrate.verlet import velocity_verlet_step1
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B, PRESSURE_UNIT_CONVERSION, TIME_UNIT_CONVERSION


@dataclass(frozen=True)
class MSST:
    shock_direction: int = 0  # 0=x, 1=y, 2=z
    vs: float = 0.0  # km/s as parsed; converted in _vs_nat
    qmass: float = 1.0e4
    mu: float = 0.0
    tscale: float = 0.0
    p0: Optional[float] = None  # GPa as parsed -> eV/A^3 at init
    v0: Optional[float] = None
    e0: Optional[float] = None
    n_steps: int = 0
    mobile: Optional[object] = None

    @property
    def _vs_nat(self):
        # km/s = 0.01 A/fs; natural time = fs * TIME_UNIT_CONVERSION
        return self.vs * 0.01 * TIME_UNIT_CONVERSION

    # ---- thermo helpers ------------------------------------------------

    def _etotal_p(self, state: MDState):
        m = state.mask
        ke = 0.5 * jnp.sum(
            state.mass * jnp.sum(state.velocity**2, axis=-1) * m
        )
        pe = jnp.sum(state.potential_energy * m)
        kin = jnp.einsum(
            "n,na,nb->ab", state.mass * m, state.velocity, state.velocity,
            precision=jax.lax.Precision.HIGHEST,
        )
        w = jnp.einsum("nab,n->ab", state.virial, m,
                   precision=jax.lax.Precision.HIGHEST)
        vol = state.box.volume
        d = self.shock_direction
        p_cur = (kin[d, d] + w[d, d]) / vol
        return ke + pe, p_cur, vol, ke

    def init(self, state: MDState):
        dtype = state.velocity.dtype
        etotal, p_cur, vol, ke = self._etotal_p(state)
        total_mass = jnp.sum(state.mass * state.mask)
        v0 = jnp.asarray(self.v0, dtype) if self.v0 is not None else vol
        e0 = jnp.asarray(self.e0, dtype) if self.e0 is not None else etotal
        p0 = (
            jnp.asarray(self.p0 / PRESSURE_UNIT_CONVERSION, dtype)
            if self.p0 is not None else p_cur
        )
        omega = -jnp.sqrt(self.tscale * total_mass / self.qmass * ke)
        return {
            "omega": omega.astype(dtype),
            "v0": v0, "e0": e0, "p0": p0,
            "total_mass": total_mass.astype(dtype),
            "tscale_applied": jnp.asarray(False),
            "lagrangian": jnp.zeros((), dtype),
        }

    def _maybe_apply_tscale(self, state, aux):
        """One-time velocity rescale by sqrt(1 - tscale) at step 0."""
        factor = jnp.where(
            aux["tscale_applied"], 1.0, jnp.sqrt(1.0 - self.tscale)
        ).astype(state.velocity.dtype)
        state = state._replace(velocity=state.velocity * factor)
        return state, {**aux, "tscale_applied": jnp.asarray(True)}

    def _get_omega(self, state, aux, dthalf):
        """d(omega)/dt half step at fixed volume (ref: get_omega)."""
        _, p_cur, vol, _ = self._etotal_p(state)
        m_tot = aux["total_mass"]
        v0 = aux["v0"]
        vs2 = self._vs_nat**2
        p_msst = vs2 * m_tot * (v0 - vol) / (v0 * v0)
        a = m_tot * (p_cur - aux["p0"] - p_msst) / self.qmass
        b = m_tot * self.mu / (self.qmass * vol)
        a = jnp.where((vol > v0) & (a > 0.0), -a, a)
        om = aux["omega"]
        big = b * dthalf > 1.0e-6
        exact = (om + a * (jnp.exp(b * dthalf) - 1.0) / jnp.where(big, b, 1.0)
                 ) * jnp.exp(-b * dthalf)
        taylor = om + (a - b * om) * dthalf + 0.5 * (
            b * b * om - a * b
        ) * dthalf * dthalf
        return {**aux, "omega": jnp.where(big, exact, taylor)}

    def _msst_v(self, state, aux, dthalf, vsum):
        """Half-step velocity update with volume-coupled drag
        (ref: gpu_msst_v)."""
        vol = state.box.volume
        om = aux["omega"]
        c = state.force / state.mass[:, None]
        tmp = om * om * self.mu / (vsum * state.mass * vol)
        d = jnp.stack([tmp, tmp, tmp], axis=-1)
        d = d.at[:, self.shock_direction].add(-2.0 * om / vol)
        v = state.velocity
        big = jnp.abs(dthalf * d) > 1.0e-6
        dn = jnp.where(big, d, 1.0)
        expd = jnp.exp(dn * dthalf)
        exact = expd * (c + dn * v - c / expd) / dn
        taylor = v + (c + d * v) * dthalf + 0.5 * (
            d * d * v + c * d
        ) * dthalf * dthalf
        v = jnp.where(big, exact, taylor) * state.mask[:, None]
        if self.mobile is not None:
            v = jnp.where(self.mobile[:, None] > 0, v, state.velocity)
        return state._replace(velocity=v)

    @staticmethod
    def _vsum(state):
        return jnp.maximum(
            jnp.sum(jnp.sum(state.velocity**2, axis=-1) * state.mask), 1e-30
        )

    def _remap(self, state, dilation):
        d = self.shock_direction
        h = state.box.h.at[d, d].mul(dilation)
        box = state.box.with_h(h)
        pos = state.position.at[:, d].mul(dilation)
        vel = state.velocity.at[:, d].mul(dilation)
        unwrapped = state.unwrapped_position
        if unwrapped is not None:
            unwrapped = unwrapped.at[:, d].mul(dilation)
        return state._replace(
            position=pos, velocity=vel, box=box,
            unwrapped_position=unwrapped,
        )

    # ---- Ensemble protocol ------------------------------------------------

    def step1(self, state: MDState, aux, dt):
        dthalf = 0.5 * dt
        state, aux = self._maybe_apply_tscale(state, aux)
        aux = self._get_omega(state, aux, dthalf)
        # velocity-sum predictor: advance once to estimate vsum, then redo
        vsum0 = self._vsum(state)
        probe = self._msst_v(state, aux, dthalf, vsum0)
        vsum1 = self._vsum(probe)
        state = self._msst_v(state, aux, dthalf, vsum1)
        vol = state.box.volume
        vol1 = vol + aux["omega"] * dthalf
        state = self._remap(state, vol1 / vol)
        state = velocity_verlet_step1(
            state, dt, self.mobile, kick=False
        )  # drift only
        vol2 = vol1 + aux["omega"] * dthalf
        state = self._remap(state, vol2 / vol1)
        return state, aux

    def step2(self, state: MDState, aux, dt):
        dthalf = 0.5 * dt
        vsum = self._vsum(state)
        state = self._msst_v(state, aux, dthalf, vsum)
        aux = self._get_omega(state, aux, dthalf)
        lag = aux["lagrangian"] - self._vs_nat * state.box.volume / aux["v0"] * dt
        return (
            state._replace(step=state.step + 1),
            {**aux, "lagrangian": lag},
        )

    # ---- diagnostics ------------------------------------------------

    def conserved(self, state: MDState, aux):
        """(e_conserved/atom, dHugoniot (K), dRayleigh (GPa))
        (ref: get_conserved)."""
        etotal, p_cur, vol, _ = self._etotal_p(state)
        m_tot = aux["total_mass"]
        v0 = aux["v0"]
        vs2 = self._vs_nat**2
        n = jnp.maximum(jnp.sum(state.mask), 1.0)
        e_msst = 0.5 * self.qmass * aux["omega"] ** 2 / m_tot
        e_msst -= 0.5 * m_tot * vs2 * (1.0 - vol / v0) ** 2
        e_msst -= aux["p0"] * (v0 - vol)
        e_cons = (etotal + e_msst) / n
        dhugo = (
            0.5 * (p_cur + aux["p0"]) * (v0 - vol) + aux["e0"] - etotal
        ) / (3.0 * n * K_B)
        dray = (
            p_cur - aux["p0"] - m_tot * vs2 * (1.0 - vol / v0) / v0
        ) * PRESSURE_UNIT_CONVERSION
        return e_cons, dhugo, dray
