"""Initial Maxwell velocities with momentum zeroing.

Matches reference semantics (ref: src/main_gpumd/velocity.cu:77-258):
draw Maxwell-Boltzmann velocities at temperature T, remove center-of-mass
linear momentum (and optionally angular momentum, as the reference does for
its CPU init path), then rescale to hit T exactly.

Uses jax.random with an explicit key — the seeded `velocity T seed` keyword
maps to key derivation, giving the reference's -DDEBUG determinism for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B


def _zero_linear_momentum(v, mass, mask):
    m = mass * mask
    p = jnp.sum(m[:, None] * v, axis=0)
    v_cm = p / jnp.sum(m)
    return (v - v_cm[None, :]) * mask[:, None]


def _zero_angular_momentum(v, position, mass, mask):
    m = mass * mask
    total_m = jnp.sum(m)
    r_cm = jnp.sum(m[:, None] * position, axis=0) / total_m
    r = (position - r_cm) * mask[:, None]
    ang_mom = jnp.sum(m[:, None] * jnp.cross(r, v), axis=0)
    # Inertia tensor I = sum m (r.r delta - r(x)r)
    r2 = jnp.sum(r * r, axis=-1)
    inertia = jnp.einsum("n,ab->ab", m * r2, jnp.eye(3, dtype=v.dtype)) - jnp.einsum(
        "n,na,nb->ab", m, r, r
    )
    omega = jnp.linalg.solve(inertia, ang_mom)
    return (v - jnp.cross(jnp.broadcast_to(omega, r.shape), r)) * mask[:, None]


def initialize_velocity(
    state: MDState,
    temperature: float,
    seed: int = 12345,
    zero_angular: bool = False,
) -> MDState:
    """Maxwell velocities at `temperature` K (natural velocity units)."""
    key = jax.random.PRNGKey(seed)
    dtype = state.position.dtype
    n = state.position.shape[0]
    sigma = jnp.sqrt(K_B * temperature / state.mass)  # natural units
    v = jax.random.normal(key, (n, 3), dtype=dtype) * sigma[:, None]
    v = _zero_linear_momentum(v, state.mass, state.mask)
    if zero_angular:
        v = _zero_angular_momentum(v, state.position, state.mass, state.mask)
    # Rescale to the exact target temperature.
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(v * v, axis=-1) * state.mask)
    n_real = jnp.sum(state.mask)
    t_now = 2.0 * ke / (3.0 * n_real * K_B)
    v = v * jnp.sqrt(temperature / t_now)
    return state._replace(velocity=v)


def correct_velocity(state: MDState) -> MDState:
    """Re-zero total linear momentum (the `correct_velocity` keyword,
    ref: run.cu:610-646)."""
    v = _zero_linear_momentum(state.velocity, state.mass, state.mask)
    return state._replace(velocity=v)
