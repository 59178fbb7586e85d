"""NVT thermostats.

All coupling constants follow the reference's run.in convention: the
`coupling` argument is tau/dt (a step count), as parsed from
`ensemble nvt_xxx T1 T2 coupling` (ref: src/integrate/integrate.cu:394-546).
T1 -> T2 ramps linearly across the run (integrate.cu:320-340); ensembles
read the instantaneous target from aux.

  * nvt_ber — Berendsen velocity rescale          (ensemble_ber.cu)
  * nvt_lan — Langevin OVO splitting: c1 = exp(-dt/(2 tau)),
              c2 = sqrt((1-c1^2) kB T / m), applied before step1 and
              after step2                          (ensemble_lan.cu:35-36)
  * nvt_bdp — Bussi-Donadio-Parrinello stochastic velocity rescaling
              (svr_utilities.cuh resamplekin)
  * nvt_nhc — Nose-Hoover chain (length 4), Suzuki-Yoshida 7-weight
              n_respa=4 factorization, masses kT tau^2 (x3N for the first)
              (ensemble_nhc.cu:28-150)

Unlike the reference (NHC scalars integrated on the CPU with a D2H copy
of the kinetic energy), everything here stays on device inside the scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B

NHC_LENGTH = 4
# Suzuki-Yoshida weights (Tuckerman), ref: ensemble_nhc.cu:118-127.
_SY_W = np.array(
    [
        0.784513610477560, 0.235573213359357, -1.17767998417887,
        1.31518632068391, -1.17767998417887, 0.235573213359357,
        0.784513610477560,
    ]
)
_N_RESPA = 4


def _ke2(state: MDState):
    """Twice the kinetic energy."""
    return jnp.sum(
        state.mass * jnp.sum(state.velocity**2, axis=-1) * state.mask
    )


def _ndof(state: MDState):
    return 3.0 * jnp.sum(state.mask)


def _target_t(self, aux):
    """Linear T1 -> T2 ramp by step index stored in aux[0]."""
    frac = aux["frac"]
    return self.t0 + (self.t1 - self.t0) * frac


@dataclass(frozen=True)
class _RampMixin:
    t0: float = 300.0
    t1: float = 300.0
    coupling: float = 100.0  # tau / dt
    n_steps: int = 0  # for the ramp; 0 = constant t0
    mobile: Optional[object] = None  # (N,) mobility mask (1 = free)
    pinned: Optional[tuple] = None  # (mask, velocity) constant-velocity group

    def _temp(self, aux):
        if self.n_steps <= 0 or self.t0 == self.t1:
            return self.t0
        return self.t0 + (self.t1 - self.t0) * (
            aux["i"].astype(jnp.float32) / self.n_steps
        )


@dataclass(frozen=True)
class NVTBerendsen(_RampMixin):
    def init(self, state):
        return {"i": jnp.zeros((), jnp.int32)}

    def step1(self, state, aux, dt):
        return velocity_verlet_step1(state, dt, self.mobile, self.pinned), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile, self.pinned)
        t_now = state.temperature()
        t0 = self._temp(aux)
        factor = jnp.sqrt(1.0 + (t0 / t_now - 1.0) / self.coupling)
        # Guard the startup T=0 singularity the same way a user would
        # (reference requires velocities initialized first).
        factor = jnp.where(jnp.isfinite(factor), factor, 1.0)
        return (
            state._replace(velocity=state.velocity * factor),
            {"i": aux["i"] + 1},
        )


@dataclass(frozen=True)
class NVTLangevin(_RampMixin):
    seed: int = 12345

    def init(self, state):
        return {"i": jnp.zeros((), jnp.int32), "key": jax.random.PRNGKey(self.seed)}

    def _kick(self, state, key, t0):
        c1 = jnp.exp(-0.5 / self.coupling)
        dtype = state.velocity.dtype
        c2 = jnp.sqrt((1.0 - c1 * c1) * K_B * t0 / state.mass).astype(dtype)
        noise = jax.random.normal(key, state.velocity.shape, dtype)
        v = c1 * state.velocity + c2[:, None] * noise
        if self.mobile is not None:
            v = jnp.where(self.mobile[:, None] > 0, v, state.velocity)
        else:
            # The random kicks impart net momentum; the reference removes it
            # after every half-kick (ref: ensemble_lan.cu:111-124
            # gpu_find_momentum/gpu_correct_momentum) so the center of mass
            # does not random-walk (contaminates MSD/diffusion).
            from gpumd_tpu.integrate.velocity import _zero_linear_momentum

            v = _zero_linear_momentum(v, state.mass, state.mask)
        return state._replace(velocity=v * state.mask[:, None])

    def step1(self, state, aux, dt):
        key, sub = jax.random.split(aux["key"])
        state = self._kick(state, sub, self._temp(aux))
        aux = {"i": aux["i"], "key": key}
        return velocity_verlet_step1(state, dt, self.mobile, self.pinned), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile, self.pinned)
        key, sub = jax.random.split(aux["key"])
        state = self._kick(state, sub, self._temp(aux))
        return state, {"i": aux["i"] + 1, "key": key}


@dataclass(frozen=True)
class NVTBDP(_RampMixin):
    """Bussi-Donadio-Parrinello stochastic velocity rescaling
    (ref: svr_utilities.cuh:104-125 resamplekin)."""

    seed: int = 12345

    def init(self, state):
        return {"i": jnp.zeros((), jnp.int32), "key": jax.random.PRNGKey(self.seed)}

    def step1(self, state, aux, dt):
        return velocity_verlet_step1(state, dt, self.mobile, self.pinned), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile, self.pinned)
        key, k1, k2 = jax.random.split(aux["key"], 3)
        ndeg = _ndof(state)
        kk = 0.5 * _ke2(state)  # current KE
        sigma = 0.5 * ndeg * K_B * self._temp(aux)  # target KE
        factor = jnp.exp(-1.0 / self.coupling)
        rr = jax.random.normal(k1, (), kk.dtype)
        # sum of (ndeg - 1) squared gaussians ~ chi^2; sample via Gamma.
        sumn = 2.0 * jax.random.gamma(k2, 0.5 * (ndeg - 1.0), dtype=kk.dtype)
        kk_new = (
            kk
            + (1.0 - factor) * (sigma * (sumn + rr * rr) / ndeg - kk)
            + 2.0 * rr * jnp.sqrt(kk * sigma / ndeg * (1.0 - factor) * factor)
        )
        scale = jnp.sqrt(kk_new / kk)
        return (
            state._replace(velocity=state.velocity * scale),
            {"i": aux["i"] + 1, "key": key},
        )


@dataclass(frozen=True)
class NVTBAOAB(_RampMixin):
    """BAOAB Langevin splitting (ref: ensemble_bao.cu): B half-kick,
    A half-drift, O full Ornstein-Uhlenbeck, A half-drift; B half-kick.
    Superior configurational sampling at large dt (Leimkuhler-Matthews).
    """

    seed: int = 12345

    def init(self, state):
        return {"i": jnp.zeros((), jnp.int32), "key": jax.random.PRNGKey(self.seed)}

    def step1(self, state, aux, dt):
        inv_m = 1.0 / state.mass
        mob = self.mobile
        v = state.velocity + (0.5 * dt) * state.force * inv_m[:, None]
        if mob is not None:
            v = v * mob[:, None]
        x = state.position + 0.5 * dt * v
        # O step: full OU with friction gamma = 1/(tau) = 1/(coupling dt)
        c1 = jnp.exp(-1.0 / self.coupling)
        t0 = self._temp(aux)
        dtype = v.dtype
        c2 = jnp.sqrt((1.0 - c1 * c1) * K_B * t0 / state.mass).astype(dtype)
        key, sub = jax.random.split(aux["key"])
        noise = jax.random.normal(sub, v.shape, dtype)
        v = c1 * v + c2[:, None] * noise
        if mob is not None:
            v = v * mob[:, None]
        v = v * state.mask[:, None]
        x = x + 0.5 * dt * v
        unwrapped = (
            state.unwrapped_position + (x - state.position)
            if state.unwrapped_position is not None
            else None
        )
        return (
            state._replace(position=x, velocity=v, unwrapped_position=unwrapped),
            {"i": aux["i"], "key": key},
        )

    def step2(self, state, aux, dt):
        inv_m = 1.0 / state.mass
        v = state.velocity + (0.5 * dt) * state.force * inv_m[:, None]
        if self.mobile is not None:
            v = v * self.mobile[:, None]
        return (
            state._replace(velocity=v, step=state.step + 1),
            {"i": aux["i"] + 1, "key": aux["key"]},
        )


@dataclass(frozen=True)
class NVTNoseHooverChain(_RampMixin):
    """Nose-Hoover chain of 4 integrated with the SY(7) x n_respa=4
    factorization, all on device (ref: ensemble_nhc.cu:100-150)."""

    def init(self, state):
        dtype = state.velocity.dtype
        return {
            "i": jnp.zeros((), jnp.int32),
            "pos": jnp.zeros((NHC_LENGTH,), dtype),
            "vel": jnp.asarray([1.0, -1.0, 1.0, -1.0], dtype),
        }

    def _masses(self, state, t0, dt):
        tau = dt * self.coupling
        kt = K_B * t0
        mas = jnp.full((NHC_LENGTH,), kt * tau * tau, state.velocity.dtype)
        return mas.at[0].mul(_ndof(state))

    def _chain(self, state, aux, dt, dt_half):
        """One NHC half-update; returns (velocity scale factor, aux')."""
        t0 = self._temp(aux)
        kt = K_B * t0
        dn = _ndof(state)
        mas = self._masses(state, t0, dt)
        ek2 = _ke2(state)
        pos, vel = aux["pos"], aux["vel"]
        factor = jnp.ones((), ek2.dtype)
        m = NHC_LENGTH
        for n1 in range(7):
            dt2 = dt_half * _SY_W[n1] / _N_RESPA
            dt4 = dt2 * 0.5
            dt8 = dt4 * 0.5
            for _ in range(_N_RESPA):
                # update last chain velocity
                g = (vel[m - 2] ** 2 / mas[m - 2]) - kt
                vel = vel.at[m - 1].add(dt4 * g)
                # downward sweep
                for j in range(m - 2, -1, -1):
                    tmp = jnp.exp(-dt8 * vel[j + 1] / mas[j + 1])
                    g = (vel[j - 1] ** 2 / mas[j - 1] - kt) if j > 0 else (
                        ek2 - dn * kt
                    )
                    vel = vel.at[j].set(tmp * (tmp * vel[j] + dt4 * g))
                # particle scale
                s = jnp.exp(-dt2 * vel[0] / mas[0])
                factor = factor * s
                ek2 = ek2 * s * s
                pos = pos + dt2 * vel / mas
                # upward sweep
                for j in range(0, m - 1):
                    tmp = jnp.exp(-dt8 * vel[j + 1] / mas[j + 1])
                    g = (vel[j - 1] ** 2 / mas[j - 1] - kt) if j > 0 else (
                        ek2 - dn * kt
                    )
                    vel = vel.at[j].set(tmp * (tmp * vel[j] + dt4 * g))
                g = vel[m - 2] ** 2 / mas[m - 2] - kt
                vel = vel.at[m - 1].add(dt4 * g)
        return factor, {**aux, "pos": pos, "vel": vel}

    def step1(self, state, aux, dt):
        factor, aux = self._chain(state, aux, dt, 0.5 * dt)
        state = state._replace(velocity=state.velocity * factor)
        return velocity_verlet_step1(state, dt, self.mobile, self.pinned), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile, self.pinned)
        factor, aux = self._chain(state, aux, dt, 0.5 * dt)
        state = state._replace(velocity=state.velocity * factor)
        return state, {**aux, "i": aux["i"] + 1}
