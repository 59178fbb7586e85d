"""NEMD heat-source/sink ensembles.

`ensemble heat_lan T Tc dT source_group sink_group` (grouping method 0,
ref: integrate.cu:700-752, ensemble_lan.cu:60-80): Langevin thermostats at
T + dT on the source group and T - dT on the sink group; all other atoms
evolve as NVE.  Used with `compute` / `compute_shc` for NEMD thermal
conductivity (BASELINE config graphene_kappa_nemd).

`heat_nhc` runs one Nose-Hoover chain per bath on the group's
center-of-mass-relative kinetic energy and rescales only the relative
velocities, conserving group momentum (ref: ensemble_nhc.cu:236-335,
ensemble.cu:700-880 find_vc_and_ke / scale_velocity_local).

`heat_bdp` applies BDP stochastic rescaling per group the same way
(ref: ensemble_bdp.cu:104-160).

All three accumulate the cumulative energy the baths inject
(`aux["e_transfer"]`, source then sink) so NEMD flux can be measured the
same way the reference's energy_transferred[] is.
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
        # reference sign convention: energy transferred from the SYSTEM to
        # the BATH (ref: ensemble_lan.cu:152-194 += before, -= after)
        de = ke_before - ke_after
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


def _group_vc_ke2(state, gmask):
    """Group center-of-mass velocity and 2x COM-relative kinetic energy
    (ref: ensemble.cu:700-777 gpu_find_vc_and_ke)."""
    m = state.mass * gmask
    mc = jnp.sum(m)
    vc = jnp.sum(m[:, None] * state.velocity, axis=0) / mc
    ke2 = jnp.sum(m * jnp.sum(state.velocity**2, axis=-1))
    ke2 = ke2 - mc * jnp.sum(vc * vc)
    return vc, ke2


def _scale_relative(state, gmask, vc, factor):
    """v <- vc + factor (v - vc) on the group (momentum conserving)."""
    v = vc[None, :] + factor * (state.velocity - vc[None, :])
    v = jnp.where(gmask[:, None] > 0, v, state.velocity)
    return state._replace(velocity=v * state.mask[:, None])


_NHC_SY = jnp.asarray(
    [0.784513610477560, 0.235573213359357, -1.17767998417887,
     1.31518632068391, -1.17767998417887, 0.235573213359357,
     0.784513610477560]
)


def nhc_scalar(pos, vel, mas, ek2, kt, dn, dt_half, n_respa=4):
    """One Nose-Hoover-chain half update on scalars; returns
    (scale factor, pos', vel').  Chain length from pos.shape (4).
    (ref: ensemble_nhc.cu:97-160 nhc())."""
    m = pos.shape[0]
    factor = jnp.ones((), ek2.dtype)
    for n1 in range(7):
        dt2 = dt_half * _NHC_SY[n1] / n_respa
        dt4 = dt2 * 0.5
        dt8 = dt4 * 0.5
        for _ in range(n_respa):
            g = vel[m - 2] ** 2 / mas[m - 2] - kt
            vel = vel.at[m - 1].add(dt4 * g)
            for j in range(m - 2, -1, -1):
                tmp = jnp.exp(-dt8 * vel[j + 1] / mas[j + 1])
                g = (vel[j - 1] ** 2 / mas[j - 1] - kt) if j > 0 else (
                    ek2 - dn * kt
                )
                vel = vel.at[j].set(tmp * (tmp * vel[j] + dt4 * g))
            pos = pos + dt2 * vel / mas
            s = jnp.exp(-dt2 * vel[0] / mas[0])
            factor = factor * s
            ek2 = ek2 * s * s
            for j in range(0, m - 1):
                tmp = jnp.exp(-dt8 * vel[j + 1] / mas[j + 1])
                g = (vel[j - 1] ** 2 / mas[j - 1] - kt) if j > 0 else (
                    ek2 - dn * kt
                )
                vel = vel.at[j].set(tmp * (tmp * vel[j] + dt4 * g))
            g = vel[m - 2] ** 2 / mas[m - 2] - kt
            vel = vel.at[m - 1].add(dt4 * g)
    return factor, pos, vel


@dataclass(frozen=True)
class HeatNHC:
    """heat_nhc: one NHC per bath acting on COM-relative velocities
    (ref: ensemble_nhc.cu:236-335)."""

    temperature: float
    coupling: float  # tau / dt
    delta_t: float
    source_mask: object
    sink_mask: object
    mobile: Optional[object] = None

    def init(self, state):
        dtype = state.velocity.dtype
        vel0 = jnp.asarray([1.0, -1.0, 1.0, -1.0], dtype)
        return {
            "pos1": jnp.zeros((4,), dtype), "vel1": vel0,
            "pos2": jnp.zeros((4,), dtype), "vel2": vel0,
            "e_transfer": jnp.zeros((2,), dtype),
        }

    def _masses(self, kt, dn, dt, dtype):
        tau = dt * self.coupling
        mas = jnp.full((4,), kt * tau * tau, dtype)
        return mas.at[0].mul(dn)

    def _baths(self, state, aux, dt):
        dtype = state.velocity.dtype
        src = jnp.asarray(self.source_mask, dtype)
        snk = jnp.asarray(self.sink_mask, dtype)
        kt1 = K_B * (self.temperature + self.delta_t)
        kt2 = K_B * (self.temperature - self.delta_t)
        dn1 = 3.0 * jnp.sum(src)
        dn2 = 3.0 * jnp.sum(snk)
        vc1, ek1 = _group_vc_ke2(state, src)
        vc2, ek2 = _group_vc_ke2(state, snk)
        f1, p1, v1 = nhc_scalar(
            aux["pos1"], aux["vel1"], self._masses(kt1, dn1, dt, dtype),
            ek1, kt1, dn1, 0.5 * dt,
        )
        f2, p2, v2 = nhc_scalar(
            aux["pos2"], aux["vel2"], self._masses(kt2, dn2, dt, dtype),
            ek2, kt2, dn2, 0.5 * dt,
        )
        de = jnp.stack([ek1 * 0.5 * (1.0 - f1 * f1),
                        ek2 * 0.5 * (1.0 - f2 * f2)])
        state = _scale_relative(state, src, vc1, f1)
        state = _scale_relative(state, snk, vc2, f2)
        aux = {**aux, "pos1": p1, "vel1": v1, "pos2": p2, "vel2": v2,
               "e_transfer": aux["e_transfer"] + de}
        return state, aux

    def step1(self, state, aux, dt):
        state, aux = self._baths(state, aux, dt)
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile)
        return self._baths(state, aux, dt)


@dataclass(frozen=True)
class HeatBDP:
    """heat_bdp: BDP stochastic rescaling per bath on COM-relative
    velocities (ref: ensemble_bdp.cu:104-160; dN = 3 (N_group - 1))."""

    temperature: float
    coupling: float
    delta_t: float
    source_mask: object
    sink_mask: object
    seed: int = 12345
    mobile: Optional[object] = None

    def init(self, state):
        return {
            "key": jax.random.PRNGKey(self.seed),
            "e_transfer": jnp.zeros((2,), state.velocity.dtype),
        }

    def _resample(self, key, kk, sigma, ndeg):
        factor = jnp.exp(-1.0 / self.coupling)
        k1, k2 = jax.random.split(key)
        rr = jax.random.normal(k1, (), kk.dtype)
        sumn = 2.0 * jax.random.gamma(k2, 0.5 * (ndeg - 1.0), dtype=kk.dtype)
        kk_new = (
            kk + (1.0 - factor) * (sigma * (sumn + rr * rr) / ndeg - kk)
            + 2.0 * rr * jnp.sqrt(kk * sigma / ndeg * (1.0 - factor) * factor)
        )
        return jnp.sqrt(kk_new / kk)

    def _baths(self, state, aux, dt):
        dtype = state.velocity.dtype
        src = jnp.asarray(self.source_mask, dtype)
        snk = jnp.asarray(self.sink_mask, dtype)
        key, ka, kb = jax.random.split(aux["key"], 3)
        vc1, ek1 = _group_vc_ke2(state, src)
        vc2, ek2 = _group_vc_ke2(state, snk)
        dn1 = 3.0 * (jnp.sum(src) - 1.0)
        dn2 = 3.0 * (jnp.sum(snk) - 1.0)
        s1 = 0.5 * dn1 * K_B * (self.temperature + self.delta_t)
        s2 = 0.5 * dn2 * K_B * (self.temperature - self.delta_t)
        f1 = self._resample(ka, 0.5 * ek1, s1, dn1)
        f2 = self._resample(kb, 0.5 * ek2, s2, dn2)
        de = jnp.stack([ek1 * 0.5 * (1.0 - f1 * f1),
                        ek2 * 0.5 * (1.0 - f2 * f2)])
        state = _scale_relative(state, src, vc1, f1)
        state = _scale_relative(state, snk, vc2, f2)
        return state, {**aux, "key": key,
                       "e_transfer": aux["e_transfer"] + de}

    def step1(self, state, aux, dt):
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile)
        return self._baths(state, aux, dt)


@dataclass(frozen=True)
class HeatHybrid:
    """heat_hybrid: N local baths, each NHC or Langevin, on grouping-method-0
    groups; bath 0 is the source at T + dT, the rest sinks at T - dT
    (ref: ensemble_heat_hybrid.cu).  NHC baths act on COM-relative
    velocities (momentum conserving); Langevin baths kick the whole group.
    Per-bath injected energy accumulates in aux["e_transfer"] (nt,)."""

    kinds: tuple  # ("nhc"|"lan", ...) per bath
    temperature: float
    couplings: tuple  # tau/dt per bath
    delta_t: float
    masks: tuple  # per-bath (N,) group masks
    seed: int = 12345
    mobile: Optional[object] = None

    def _target(self, i):
        return self.temperature + (self.delta_t if i == 0 else -self.delta_t)

    def init(self, state):
        dtype = state.velocity.dtype
        nt = len(self.kinds)
        vel0 = jnp.asarray([1.0, -1.0, 1.0, -1.0], dtype)
        return {
            "pos": jnp.zeros((nt, 4), dtype),
            "vel": jnp.tile(vel0, (nt, 1)),
            "key": jax.random.PRNGKey(self.seed),
            "e_transfer": jnp.zeros((nt,), dtype),
        }

    def _baths(self, state, aux, dt):
        dtype = state.velocity.dtype
        key = aux["key"]
        pos, vel = aux["pos"], aux["vel"]
        de_all = []
        for i, kind in enumerate(self.kinds):
            g = jnp.asarray(self.masks[i], dtype)
            kt = K_B * self._target(i)
            if kind == "nhc":
                dn = 3.0 * jnp.sum(g)
                tau = dt * self.couplings[i]
                mas = jnp.full((4,), kt * tau * tau, dtype).at[0].mul(dn)
                vc, ek2 = _group_vc_ke2(state, g)
                f, p_i, v_i = nhc_scalar(
                    pos[i], vel[i], mas, ek2, kt, dn, 0.5 * dt
                )
                pos = pos.at[i].set(p_i)
                vel = vel.at[i].set(v_i)
                state = _scale_relative(state, g, vc, f)
                de_all.append(ek2 * 0.5 * (1.0 - f * f))
            else:  # langevin
                key, sub = jax.random.split(key)
                c1 = jnp.exp(-0.5 / self.couplings[i])
                c2 = jnp.sqrt((1 - c1 * c1) * kt / state.mass).astype(dtype)
                noise = jax.random.normal(sub, state.velocity.shape, dtype)
                ke_b = 0.5 * state.mass * jnp.sum(state.velocity**2, -1)
                v_new = c1 * state.velocity + c2[:, None] * noise
                v = jnp.where(g[:, None] > 0, v_new, state.velocity)
                state = state._replace(velocity=v * state.mask[:, None])
                ke_a = 0.5 * state.mass * jnp.sum(state.velocity**2, -1)
                de_all.append(jnp.sum((ke_b - ke_a) * g))
        aux = {**aux, "pos": pos, "vel": vel, "key": key,
               "e_transfer": aux["e_transfer"] + jnp.stack(de_all)}
        return state, aux

    def step1(self, state, aux, dt):
        state, aux = self._baths(state, aux, dt)
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile)
        return self._baths(state, aux, dt)
