"""Shock-wall drivers (ref: src/integrate/ensemble_wall_{piston,mirror,
harmonic}.cu): NVE with special x-direction wall rules.

  wall_piston:   atoms with x < thickness at init move rigidly at vx = vp
                 (the piston); atoms with x > Lx - thickness are frozen.
  wall_mirror:   frozen right wall; a specular mirror starting at x = 0
                 advances at vp — atoms crossing it reflect in the moving
                 frame (x -> 2 p - x, vx -> 2 vp - vx).
  wall_harmonic: frozen right wall; a harmonic wall at x = vp t pushes
                 atoms left of it with f_x += k (x_wall - x); a hard floor
                 at x = 0 reflects.

Wall membership is frozen at run start from initial positions (reference
gpu_find_wall at init)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from gpumd_tpu.model.state import MDState


def _half_kick(state, dt, frozen, piston=None, vp=0.0):
    a = state.force / state.mass[:, None]
    v = state.velocity + 0.5 * dt * a
    v = jnp.where(frozen[:, None] > 0, 0.0, v)
    if piston is not None:
        vpvec = jnp.stack(
            [jnp.full_like(state.mass, vp), jnp.zeros_like(state.mass),
             jnp.zeros_like(state.mass)], axis=-1,
        )
        v = jnp.where(piston[:, None] > 0, vpvec, v)
    return state._replace(velocity=v * state.mask[:, None])


@dataclass(frozen=True)
class WallPiston:
    """ensemble wall_piston vp v thickness d (ref: ensemble_wall_piston.cu).
    vp in A/fs is converted by the parser to natural units."""

    vp: float = 0.0
    thickness: float = 20.0

    def init(self, state: MDState):
        x = state.position[:, 0]
        lx = state.box.h[0, 0]
        return {
            "piston": (x < self.thickness).astype(x.dtype) * state.mask,
            "frozen": (x > lx - self.thickness).astype(x.dtype) * state.mask,
            "i": jnp.zeros((), jnp.int32),
        }

    def step1(self, state, aux, dt):
        state = _half_kick(state, dt, aux["frozen"], aux["piston"], self.vp)
        state = state._replace(
            position=state.position + dt * state.velocity * state.mask[:, None]
        )
        return state, aux

    def step2(self, state, aux, dt):
        state = _half_kick(state, dt, aux["frozen"], aux["piston"], self.vp)
        return state, {**aux, "i": aux["i"] + 1}


@dataclass(frozen=True)
class WallMirror:
    """ensemble wall_mirror vp v thickness d (ref: ensemble_wall_mirror.cu)."""

    vp: float = 0.0
    thickness: float = 20.0

    def init(self, state: MDState):
        x = state.position[:, 0]
        lx = state.box.h[0, 0]
        return {
            "frozen": (x > lx - self.thickness).astype(x.dtype) * state.mask,
            "pos": jnp.zeros((), x.dtype),
            "i": jnp.zeros((), jnp.int32),
        }

    def _reflect(self, state, p):
        x = state.position[:, 0]
        vx = state.velocity[:, 0]
        hit = x < p
        x2 = jnp.where(hit, 2.0 * p - x, x)
        vx2 = jnp.where(hit, 2.0 * self.vp - vx, vx)
        return state._replace(
            position=state.position.at[:, 0].set(x2),
            velocity=state.velocity.at[:, 0].set(vx2),
        )

    def step1(self, state, aux, dt):
        state = _half_kick(state, dt, aux["frozen"])
        state = state._replace(
            position=state.position + dt * state.velocity * state.mask[:, None]
        )
        state = self._reflect(state, aux["pos"])
        return state, aux

    def step2(self, state, aux, dt):
        p = aux["pos"] + dt * self.vp
        state = _half_kick(state, dt, aux["frozen"])
        state = self._reflect(state, p)
        return state, {**aux, "pos": p, "i": aux["i"] + 1}


@dataclass(frozen=True)
class WallHarmonic:
    """ensemble wall_harmonic vp v k kk thickness d
    (ref: ensemble_wall_harmonic.cu)."""

    vp: float = 0.0
    k: float = 5.0  # eV/A^2
    thickness: float = 20.0

    def init(self, state: MDState):
        x = state.position[:, 0]
        lx = state.box.h[0, 0]
        return {
            "frozen": (x > lx - self.thickness).astype(x.dtype) * state.mask,
            "pos": jnp.zeros((), x.dtype),
            "i": jnp.zeros((), jnp.int32),
        }

    def _wall_force(self, state, p):
        x = state.position[:, 0]
        fx = state.force[:, 0]
        push = (x < p).astype(x.dtype) * state.mask
        fx2 = fx + push * self.k * (p - x)
        return state._replace(force=state.force.at[:, 0].set(fx2))

    def _floor(self, state):
        x = state.position[:, 0]
        vx = state.velocity[:, 0]
        hit = x < 0.0
        return state._replace(
            position=state.position.at[:, 0].set(jnp.where(hit, -x, x)),
            velocity=state.velocity.at[:, 0].set(jnp.where(hit, -vx, vx)),
        )

    def step1(self, state, aux, dt):
        state = self._wall_force(state, aux["pos"])
        state = _half_kick(state, dt, aux["frozen"])
        state = state._replace(
            position=state.position + dt * state.velocity * state.mask[:, None]
        )
        state = self._floor(state)
        return state, aux

    def step2(self, state, aux, dt):
        p = aux["pos"] + dt * self.vp
        state = self._wall_force(state, p)
        state = _half_kick(state, dt, aux["frozen"])
        state = self._floor(state)
        return state, {**aux, "pos": p, "i": aux["i"] + 1}
