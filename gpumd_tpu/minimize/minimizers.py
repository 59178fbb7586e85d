"""Energy minimizers: steepest descent and FIRE.

run.in keywords (ref: src/minimize/minimize.cu:32-155):
    minimize sd   <force_tolerance> <max_steps>
    minimize fire <force_tolerance> <max_steps>

FIRE constants match the reference (minimizer_fire.cuh:24-34): f_inc 1.1,
f_dec 0.5, alpha0 0.25, f_alpha 0.99, dt0 = 1 fs, dt in [0.02, 10] dt0,
N_min 20, fictitious mass 5; implicit-Euler velocity mixing
(minimizer_fire.cu:110-180).

TPU-native: the whole minimization is one `lax.while_loop` under jit with
the convergence check on device; the reference syncs f_max to the host
every step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import TIME_UNIT_CONVERSION


def _fmax(state: MDState):
    f2 = jnp.sum(state.force**2, axis=-1) * state.mask
    return jnp.sqrt(jnp.max(f2))


def minimize_sd(
    ff: ForceField,
    state: MDState,
    force_tolerance: float,
    max_steps: int,
    step_size: float = 0.01,
):
    """Steepest descent with adaptive step (ref: minimizer_sd.cu: moves
    along F by a trial step, rejects uphill moves and shrinks)."""

    def cond(carry):
        state, gamma, it = carry
        return (it < max_steps) & (_fmax(state) > force_tolerance)

    def body(carry):
        state, gamma, it = carry
        e0 = jnp.sum(state.potential_energy * state.mask)
        fnorm = jnp.sqrt(jnp.sum(state.force**2 * state.mask[:, None]))
        dx = gamma * state.force / jnp.maximum(fnorm, 1e-30)
        trial = ff.compute(state._replace(position=state.position + dx))
        e1 = jnp.sum(trial.potential_energy * trial.mask)
        better = e1 < e0
        state = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), trial, state
        )
        gamma = jnp.where(better, gamma * 1.2, gamma * 0.5)
        return state, gamma, it + 1

    state = ff.compute(state)
    gamma0 = jnp.asarray(step_size, state.position.dtype)
    state, _, steps = jax.lax.while_loop(
        cond, body, (state, gamma0, jnp.zeros((), jnp.int32))
    )
    return state, steps


def minimize_fire(
    ff: ForceField,
    state: MDState,
    force_tolerance: float,
    max_steps: int,
):
    dt0 = 1.0 / TIME_UNIT_CONVERSION
    dt_max, dt_min = 10.0 * dt0, 0.02 * dt0
    f_inc, f_dec = 1.1, 0.5
    alpha0, f_alpha = 0.25, 0.99
    n_min = 20
    m = 5.0

    def cond(carry):
        state, v, dt, alpha, n_neg, it = carry
        return (it < max_steps) & (_fmax(state) > force_tolerance)

    def body(carry):
        state, v, dt, alpha, n_neg, it = carry
        f = state.force * state.mask[:, None]
        p = jnp.sum(v * f)
        uphill = p <= 0

        grow = (~uphill) & (n_neg > n_min)
        dt_new = jnp.where(
            grow, jnp.minimum(dt * f_inc, dt_max), dt
        )
        alpha_new = jnp.where(grow, alpha * f_alpha, alpha)
        # downhill bookkeeping
        n_neg_new = jnp.where(uphill, 0, n_neg + 1)
        dt_new = jnp.where(uphill, jnp.maximum(dt * f_dec, dt_min), dt_new)
        alpha_new = jnp.where(uphill, alpha0, alpha_new)
        pos = jnp.where(
            uphill, state.position - 0.5 * dt * v, state.position
        )
        v = jnp.where(uphill, jnp.zeros_like(v), v)

        # implicit Euler + velocity mixing
        f_mod = jnp.sqrt(jnp.sum(f * f))
        v = v + (dt_new / m) * f
        v_mod = jnp.sqrt(jnp.sum(v * v))
        v = (1.0 - alpha_new) * v + alpha_new * (
            v_mod / jnp.maximum(f_mod, 1e-30)
        ) * f
        pos = pos + dt_new * v
        state = ff.compute(state._replace(position=pos))
        return state, v, dt_new, alpha_new, n_neg_new, it + 1

    state = ff.compute(state)
    v0 = jnp.zeros_like(state.velocity)
    carry = (
        state, v0, jnp.asarray(dt0, state.position.dtype),
        jnp.asarray(alpha0, state.position.dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )
    state, _, _, _, _, steps = jax.lax.while_loop(cond, body, carry)
    return state, steps
