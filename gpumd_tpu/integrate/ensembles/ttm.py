"""Two-temperature model (TTM) ensemble.

TPU-native rebuild of the reference TTM (ref: src/integrate/
ensemble_ttm.cu): an electron-temperature field T_e on a (nz, ny, nx)
voxel grid coupled to the lattice through per-atom Langevin-like forces

    f_i = -gamma v_i + sqrt(24 kB T_e(cell_i) gamma_p / dt) (u - 1/2),
    gamma = gamma_p (+ gamma_s when |v| > v_0: electronic stopping)

and evolved by the explicit-Euler heat equation with harmonic-mean
face conductivities, the e-ph power as a sink, and an optional volumetric
source (laser heating):

    c_vol dT_e/dt = div(kappa_e grad T_e) - P_eph / V_cell + S.

Everything (voxel binning via floor-divide, the stencil via jnp.roll, the
power deposition via segment_sum) runs inside the MD jit; the explicit
substep count is fixed at init from the uniform-property Fourier limit.

run.in: ensemble ttm <gm> <gid> Ce rho_e kappa_e gamma_p gamma_s v_0
        nx ny nz T_e_init [ttm_out_interval n] [ttm_source s]
Units (ref: initialize_ttm_common): Ce*rho_e in eV/K/A^3; kappa_e input
eV/(ps K A) -> /1000 internally; gamma in amu/ps -> natural; v_0 in
km/s = A/ps -> natural.  Writes ttm_electron_temperature.out snapshots.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B, TIME_UNIT_CONVERSION


@dataclass(frozen=True)
class TTM:
    gmask: object  # (N,) 1.0 on TTM-coupled atoms
    c_vol: float  # Ce * rho_e, eV / (K A^3)
    kappa_e: float  # eV / (fs K A) (input / 1000)
    gamma_p: float  # natural mass/time units
    gamma_s: float = 0.0
    v0_sq: float = 0.0  # natural
    grid: Tuple[int, int, int] = (1, 1, 1)  # (nx, ny, nz)
    t_e_init: float = 300.0
    source: float = 0.0  # eV / (A^3 fs)
    out_interval: int = 1
    seed: int = 777
    mobile: Optional[object] = None
    # static voxel sizes from the parse-time box (explicit-step stability)
    dcell_static: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    def _substeps(self, dt_fs, dcell):
        dx, dy, dz = dcell
        voxel = 1.0 / dx**2 + 1.0 / dy**2 + 1.0 / dz**2
        fourier = 2.0 * self.kappa_e * voxel / self.c_vol
        n = max(1, int(np.ceil(dt_fs * fourier / 0.9)))
        return n

    def _cell_of(self, state):
        nx, ny, nz = self.grid
        h = state.box.h
        lx, ly, lz = h[0, 0], h[1, 1], h[2, 2]
        p = state.position
        ix = jnp.mod(jnp.floor(p[:, 0] / lx * nx).astype(jnp.int32), nx)
        iy = jnp.mod(jnp.floor(p[:, 1] / ly * ny).astype(jnp.int32), ny)
        iz = jnp.mod(jnp.floor(p[:, 2] / lz * nz).astype(jnp.int32), nz)
        return (iz * ny + iy) * nx + ix

    def init(self, state: MDState):
        nx, ny, nz = self.grid
        dtype = state.velocity.dtype
        return {
            "key": jax.random.PRNGKey(self.seed),
            "t_e": jnp.full((nz * ny * nx,), self.t_e_init, dtype),
            "ttm_force": jnp.zeros_like(state.velocity),
            "net_power": jnp.zeros((nz * ny * nx,), dtype),
            "i": jnp.zeros((), jnp.int32),
        }

    def _half_kick_ttm(self, state, aux, dt):
        gm = jnp.asarray(self.gmask, state.velocity.dtype)
        v = state.velocity + 0.5 * dt * aux["ttm_force"] / state.mass[:, None]
        v = jnp.where(gm[:, None] > 0, v, state.velocity)
        return state._replace(velocity=v * state.mask[:, None])

    def _update_force(self, state, aux, dt):
        dtype = state.velocity.dtype
        gm = jnp.asarray(self.gmask, dtype)
        cell = self._cell_of(state)
        t_e = aux["t_e"][cell]
        key, sub = jax.random.split(aux["key"])
        u = jax.random.uniform(sub, state.velocity.shape, dtype) - 0.5
        vsq = jnp.sum(state.velocity**2, axis=-1)
        gamma = jnp.where(vsq > self.v0_sq, self.gamma_p + self.gamma_s,
                          self.gamma_p)
        gfac = jnp.sqrt(jnp.maximum(t_e, 0.0) * 24.0 * K_B * self.gamma_p / dt)
        f = -gamma[:, None] * state.velocity + gfac[:, None] * u
        f = f * (gm * (t_e > 0))[:, None]
        return {**aux, "key": key, "ttm_force": f}

    def _accumulate_power(self, state, aux):
        gm = jnp.asarray(self.gmask, state.velocity.dtype)
        cell = self._cell_of(state)
        p = jnp.sum(aux["ttm_force"] * state.velocity, axis=-1) * gm
        p = p / TIME_UNIT_CONVERSION  # eV per fs
        nx, ny, nz = self.grid
        net = jax.ops.segment_sum(p, cell, num_segments=nx * ny * nz)
        return {**aux, "net_power": net}

    def _diffuse(self, state, aux, dt):
        nx, ny, nz = self.grid
        dtype = aux["t_e"].dtype
        h = state.box.h
        dx, dy, dz = h[0, 0] / nx, h[1, 1] / ny, h[2, 2] / nz
        vol = dx * dy * dz
        dt_fs = dt * TIME_UNIT_CONVERSION
        # static substep count from the initial geometry (stability)
        n_sub = self._substeps(
            float(dt * TIME_UNIT_CONVERSION), self.dcell_static
        )
        inner = dt_fs / n_sub
        kap = self.kappa_e
        c = self.c_vol
        sink = aux["net_power"] / vol

        t = aux["t_e"].reshape(nz, ny, nx)

        def sub(t, _):
            lap = (
                (jnp.roll(t, 1, 2) + jnp.roll(t, -1, 2) - 2 * t) / (dx * dx)
                + (jnp.roll(t, 1, 1) + jnp.roll(t, -1, 1) - 2 * t) / (dy * dy)
                + (jnp.roll(t, 1, 0) + jnp.roll(t, -1, 0) - 2 * t) / (dz * dz)
            )
            t = t + inner / c * (
                kap * lap - sink.reshape(nz, ny, nx) + self.source
            )
            return t, None

        t, _ = jax.lax.scan(sub, t, None, length=n_sub)
        return {**aux, "t_e": t.reshape(-1)}

    def step1(self, state, aux, dt):
        state = self._half_kick_ttm(state, aux, dt)
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def step2(self, state, aux, dt):
        aux = self._update_force(state, aux, dt)
        state = velocity_verlet_step2(state, dt, self.mobile)
        state = self._half_kick_ttm(state, aux, dt)
        aux = self._accumulate_power(state, aux)
        aux = self._diffuse(state, aux, dt)
        return state, {**aux, "i": aux["i"] + 1}
