"""Path-integral MD: PIMD / RPMD / TRPMD with the bead axis vmapped.

Algorithm matches the reference (ref: src/integrate/ensemble_pimd.cu):
  * real DFT bead <-> normal-mode transform C (152-172)
  * free ring-polymer evolution per mode with Cayley-stabilized rotation,
    omega_k = 2 omega_n sin(k pi / P), omega_n = P kB T / hbar (230-245)
  * PILE Langevin on normal modes: c1_k = exp(-dt omega_k) for internal
    modes; centroid c1_0 = exp(-dt/(2 tau)) (PIMD only) (324-326)
  * c2_k = sqrt((1 - c1^2) P kB T / m)

Modes:  pimd  — thermostat all modes (centroid + internal)
        trpmd — thermostat internal modes only
        rpmd  — no thermostat

TPU-native: beads are a leading axis (P, N, 3); forces for ALL beads
evaluate as one vmap over the force field; the normal-mode transform is a
(P, P) matmul on the bead axis.  The reference stores bead pointers and
loops serially per atom (gpu_nve_1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import HBAR, K_B


def transformation_matrix(p: int) -> np.ndarray:
    """(P, P) orthogonal real-DFT matrix C[j, k]
    (ref: ensemble_pimd.cu:152-172)."""
    c = np.zeros((p, p))
    s1 = np.sqrt(1.0 / p)
    s2 = np.sqrt(2.0 / p)
    for j in range(1, p + 1):
        sign = 1.0 if j % 2 == 0 else -1.0
        for k in range(p):
            arg = 2.0 * np.pi * j * k / p
            if k == 0:
                c[j - 1, k] = s1
            elif k < p // 2:
                c[j - 1, k] = s2 * np.cos(arg)
            elif k == p // 2:
                c[j - 1, k] = s1 * sign
            else:
                c[j - 1, k] = s2 * np.sin(arg)
    return c


class PIMDState(NamedTuple):
    position: jnp.ndarray  # (P, N, 3)
    velocity: jnp.ndarray  # (P, N, 3)
    force: jnp.ndarray  # (P, N, 3)
    potential: jnp.ndarray  # (P, N)
    key: jnp.ndarray


@dataclass(frozen=True)
class PIMDRunner:
    """One jit-compiled PIMD run block over a base MDState template."""

    ff: ForceField
    base: MDState  # provides mass/type/box/mask
    n_beads: int
    temperature: float
    coupling: float  # tau/dt for the centroid (PIMD)
    mode: str = "pimd"  # pimd | rpmd | trpmd

    def init(self, seed: int = 0) -> PIMDState:
        p = self.n_beads
        base = self.base
        key = jax.random.PRNGKey(seed)
        key, k1 = jax.random.split(key)
        dtype = base.position.dtype
        sigma = jnp.sqrt(
            self.n_beads * K_B * self.temperature / base.mass
        ).astype(dtype)
        v = (
            jax.random.normal(k1, (p, *base.velocity.shape), dtype)
            * sigma[None, :, None]
            * base.mask[None, :, None]
        )
        pos = jnp.broadcast_to(base.position, (p, *base.position.shape))
        st = PIMDState(
            position=pos,
            velocity=v,
            force=jnp.zeros_like(pos),
            potential=jnp.zeros((p, base.position.shape[0]), dtype),
            key=key,
        )
        return self._forces(st)

    # ---- pieces --------------------------------------------------------------

    def _forces(self, st: PIMDState) -> PIMDState:
        base = self.base

        def one_bead(pos):
            out = self.ff.compute(base._replace(position=pos))
            return out.force, out.potential_energy

        f, pe = jax.vmap(one_bead)(st.position)
        return st._replace(force=f, potential=pe)

    def _omega(self, temperature=None):
        t = self.temperature if temperature is None else temperature
        return self.n_beads * K_B * t / HBAR

    def _langevin(self, st: PIMDState, dt, temperature=None) -> PIMDState:
        if self.mode == "rpmd":
            return st
        t = self.temperature if temperature is None else temperature
        p = self.n_beads
        c = jnp.asarray(transformation_matrix(p), st.velocity.dtype)
        omega_n = self._omega(t)
        k = jnp.arange(p)
        # internal modes: c1 = exp(-dt_half omega_k), omega_k = 2 w_n sin(.)
        # (the reference applies exp(-dt w_n sin) per half step, 325)
        c1 = jnp.exp(-dt * 2.0 * omega_n * jnp.sin(k * jnp.pi / p))
        if self.mode == "pimd":
            c1 = c1.at[0].set(np.exp(-0.5 / self.coupling))
        else:  # trpmd: centroid untouched
            c1 = c1.at[0].set(1.0)
        c1 = c1.astype(st.velocity.dtype)
        c2 = jnp.sqrt(
            (1.0 - c1 * c1)[:, None]
            * (p * K_B * t / self.base.mass)[None, :]
        ).astype(st.velocity.dtype)

        key, sub = jax.random.split(st.key)
        vn = jnp.einsum("jk,jnd->knd", c, st.velocity)
        noise = jax.random.normal(sub, vn.shape, vn.dtype)
        vn = c1[:, None, None] * vn + c2[:, :, None] * noise
        v = jnp.einsum("jk,knd->jnd", c, vn)
        v = v * self.base.mask[None, :, None]
        return st._replace(velocity=v, key=key)

    def _free_rp(self, st: PIMDState, dt, temperature=None) -> PIMDState:
        """Exact (Cayley-stabilized) free ring-polymer drift in NM space."""
        p = self.n_beads
        c = jnp.asarray(transformation_matrix(p), st.velocity.dtype)
        omega_n = self._omega(temperature)
        k = jnp.arange(p)
        omega_k = 2.0 * omega_n * jnp.sin(k * jnp.pi / p)
        half = 0.5 * dt
        cay = 1.0 / (1.0 + (omega_k * half) ** 2)
        cosf = cay * (1.0 - (omega_k * half) ** 2)
        sinf = cay * omega_k * dt
        # k = 0: plain drift
        pos_k = omega_k > 0
        sin_over = jnp.where(
            pos_k, sinf / jnp.where(pos_k, omega_k, 1.0), dt
        )
        sin_times = sinf * omega_k
        cosf = cosf.astype(st.velocity.dtype)
        sin_over = sin_over.astype(st.velocity.dtype)
        sin_times = sin_times.astype(st.velocity.dtype)

        vn = jnp.einsum("jk,jnd->knd", c, st.velocity)
        xn = jnp.einsum("jk,jnd->knd", c, st.position)
        vn2 = cosf[:, None, None] * vn - sin_times[:, None, None] * xn
        xn2 = sin_over[:, None, None] * vn + cosf[:, None, None] * xn
        return st._replace(
            velocity=jnp.einsum("jk,knd->jnd", c, vn2),
            position=jnp.einsum("jk,knd->jnd", c, xn2),
        )

    def _kick(self, st: PIMDState, dt) -> PIMDState:
        inv_m = (1.0 / self.base.mass)[None, :, None]
        return st._replace(velocity=st.velocity + 0.5 * dt * st.force * inv_m)

    # ---- run -----------------------------------------------------------------

    def run(self, st: PIMDState, dt, n_steps: int, t_end=None):
        """Advance n_steps; with `t_end`, the target temperature (thermostat
        AND ring-polymer frequencies) ramps linearly temperature -> t_end
        over the block (ref: run.cu per-step temperature1 -> temperature2
        interpolation for ensemble pimd)."""
        t_start = self.temperature
        t_final = t_start if t_end is None else float(t_end)

        def step(st, i):
            frac = i.astype(st.velocity.dtype) / max(n_steps, 1)
            t_i = t_start + (t_final - t_start) * frac
            st = (
                self._langevin(st, 0.5 * dt, t_i)
                if self.mode != "rpmd" else st
            )
            st = self._kick(st, dt)
            st = self._free_rp(st, dt, t_i)
            st = self._forces(st)
            st = self._kick(st, dt)
            st = (
                self._langevin(st, 0.5 * dt, t_i)
                if self.mode != "rpmd" else st
            )
            # observables: centroid temperature and mean potential
            ke_cent = 0.5 * jnp.sum(
                self.base.mass
                * jnp.sum(jnp.mean(st.velocity, axis=0) ** 2, axis=-1)
                * self.base.mask
            )
            obs = {
                "t_beads": jnp.sum(
                    self.base.mask
                    * self.base.mass
                    * jnp.sum(st.velocity**2, axis=(0, -1))
                )
                / (3.0 * self.n_beads * jnp.sum(self.base.mask) * K_B),
                "pe": jnp.mean(jnp.sum(st.potential, axis=1)),
            }
            return st, obs

        @jax.jit
        def _run(st):
            return jax.lax.scan(step, st, jnp.arange(n_steps))

        return _run(st)
