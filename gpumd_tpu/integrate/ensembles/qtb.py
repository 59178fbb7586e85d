"""Quantum thermal bath (QTB): Langevin with colored noise whose spectrum
carries the quantum harmonic-oscillator energy  theta(omega, T) =
hbar*omega (1/2 + n_BE)  instead of kB T (Dammak et al. PRL 103, 190601).

(ref: src/integrate/ensemble_qtb.cu:1-338) The bath force per atom is a
moving-average filter over a per-atom Gaussian history:
  fran_i = gamma3 sqrt(m_i) sum_m H[m] r_i[nfreq2-1-m]
refreshed every `alpha` steps (alpha = max(1, 1/(2 f_max dt))), with the
time filter H the inverse DFT of the target spectrum (built host-side at
init — the spectrum depends only on the static target temperature).
Velocity update per half step: v += dt/2 (fran/m - v/tau), with total
momentum re-zeroed.

run.in: ensemble nvt_qtb T1 T2 Tc [f_max THz] [N_f n]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import HBAR, K_B, TIME_UNIT_CONVERSION


def qtb_time_filter(temperature, dt, f_max_thz, n_f, alpha):
    """Host-side time-domain filter H (ref: update_time_filter)."""
    nfreq2 = 2 * n_f
    h_timestep = alpha * dt
    omega_h = np.zeros(nfreq2)
    for k in range(nfreq2):
        ks = k - n_f
        if k == n_f:
            omega_h[k] = np.sqrt(K_B * temperature)
            continue
        f_k = ks / (nfreq2 * h_timestep)
        energy_k = 2.0 * np.pi * HBAR * abs(f_k)
        x = energy_k / (K_B * temperature)
        qfac = 0.5 + (1.0 / (np.exp(x) - 1.0) if x < 200.0 else 0.0)
        val = np.sqrt(energy_k * qfac)
        num = np.sin(ks * np.pi / (2.0 * alpha * n_f))
        den = np.sin(ks * np.pi / (2.0 * n_f))
        omega_h[k] = val * alpha * num / den
    t_n = np.arange(nfreq2) - n_f
    omega_k = (np.arange(nfreq2) - n_f) * np.pi / n_f
    time_h = (omega_h[None, :] * np.cos(omega_k[None, :] * t_n[:, None])).sum(
        axis=1
    ) / nfreq2
    return time_h


@dataclass(frozen=True)
class NVTQTB:
    temperature: float = 300.0
    coupling: float = 100.0  # tau/dt
    dt: float = 0.01  # natural units, needed at init for the filter
    f_max: float = 50.0  # THz
    n_f: int = 100
    seed: int = 615461
    mobile: Optional[object] = None

    def _alpha(self):
        f_nat = self.f_max * TIME_UNIT_CONVERSION / 1000.0
        return max(1, int(1.0 / (2.0 * f_nat * self.dt)))

    def init(self, state: MDState):
        dtype = state.velocity.dtype
        n = state.position.shape[0]
        nfreq2 = 2 * self.n_f
        alpha = self._alpha()
        time_h = qtb_time_filter(
            self.temperature, self.dt, self.f_max, self.n_f, alpha
        )
        key = jax.random.PRNGKey(self.seed)
        key, sub = jax.random.split(key)
        hist = jax.random.normal(sub, (n, nfreq2, 3), dtype) / np.sqrt(12.0)
        return {
            "key": key,
            "hist": hist,
            "fran": jnp.zeros((n, 3), dtype),
            "counter": jnp.zeros((), jnp.int32),
            "time_h": jnp.asarray(time_h, dtype),
        }

    def _refresh(self, state, aux):
        key, sub = jax.random.split(aux["key"])
        dtype = state.velocity.dtype
        n, nfreq2 = aux["hist"].shape[0], aux["hist"].shape[1]
        fresh = jax.random.normal(sub, (n, 1, 3), dtype) / np.sqrt(12.0)
        hist = jnp.concatenate([aux["hist"][:, 1:], fresh], axis=1)
        alpha = self._alpha()
        h_timestep = alpha * self.dt
        fric = 1.0 / (self.coupling * self.dt)
        gamma3 = np.sqrt(2.0 * fric * 12.0 / h_timestep) * jnp.sqrt(
            state.mass
        ).astype(dtype)
        # correlate against the time-reversed filter
        h_rev = aux["time_h"][::-1]
        fran = jnp.einsum("nmk,m->nk", hist, h_rev) * gamma3[:, None]
        return {**aux, "key": key, "hist": hist, "fran": fran}

    def _half_kick(self, state, aux, dt):
        fric = 1.0 / (self.coupling * self.dt)
        inv_m = 1.0 / state.mass
        v = state.velocity + 0.5 * dt * (
            aux["fran"] * inv_m[:, None] - fric * state.velocity
        )
        if self.mobile is not None:
            v = jnp.where(self.mobile[:, None] > 0, v, state.velocity)
        from gpumd_tpu.integrate.velocity import _zero_linear_momentum

        v = _zero_linear_momentum(v, state.mass, state.mask)
        return state._replace(velocity=v * state.mask[:, None])

    def step1(self, state, aux, dt):
        aux = jax.lax.cond(
            aux["counter"] == 0,
            lambda a: self._refresh(state, a),
            lambda a: a,
            aux,
        )
        state = self._half_kick(state, aux, dt)
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile)
        state = self._half_kick(state, aux, dt)
        alpha = self._alpha()
        return state, {**aux, "counter": (aux["counter"] + 1) % alpha}


@dataclass(frozen=True)
class NPTQTB:
    """npt_qtb: QTB colored-noise thermostat + MTTK Parrinello-Rahman
    barostat (ref: src/integrate/ensemble_npt_qtb.cu): the barostat runs
    without its own NHC temperature chain; the QTB Langevin-like kicks
    wrap the MTTK half-steps."""

    qtb: NVTQTB
    baro: object  # MTTK with use_barostat=True, use_thermostat=False

    # app plumbing passthroughs
    @property
    def mobile(self):
        return self.qtb.mobile

    def init(self, state: MDState):
        return {**self.baro.init(state), **self.qtb.init(state)}

    def step1(self, state, aux, dt):
        import jax as _jax

        aux = _jax.lax.cond(
            aux["counter"] == 0,
            lambda a: self.qtb._refresh(state, a),
            lambda a: a,
            aux,
        )
        state = self.qtb._half_kick(state, aux, dt)
        return self.baro.step1(state, aux, dt)

    def step2(self, state, aux, dt):
        state, aux = self.baro.step2(state, aux, dt)
        state = self.qtb._half_kick(state, aux, dt)
        alpha = self.qtb._alpha()
        return state, {**aux, "counter": (aux["counter"] + 1) % alpha}
