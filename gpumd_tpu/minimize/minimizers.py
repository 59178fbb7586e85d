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


def minimize_fire_box(
    ff: ForceField,
    state: MDState,
    force_tolerance: float,
    max_steps: int,
    hydrostatic: bool = False,
):
    """FIRE on the extended (atoms + box) coordinate vector
    (ref: src/minimize/minimizer_fire_box_change.cu:239-404).

    The box degrees of freedom see a generalized force W / L_scale (total
    virial, L_scale = cbrt(V0) fixed at start); each step applies the strain
    increment dEps = v_box dt / L_scale as H += dEps H and r += v dt +
    dEps r.  With `hydrostatic`, the virial is replaced by its isotropic
    part so only the volume relaxes.  Converged when f_max < tol AND
    max |stress| < 1e-4 GPa (stress measured on the raw anisotropic tensor,
    or |pressure| in hydrostatic mode, matching :285-305)."""
    from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

    dt0 = 1.0 / TIME_UNIT_CONVERSION
    dt_max, dt_min = 10.0 * dt0, 0.02 * dt0
    f_inc, f_dec = 1.1, 0.5
    alpha0, f_alpha = 0.25, 0.99
    n_min = 20
    m = 5.0
    stress_tol = 1e-4  # GPa

    state = ff.compute(state)
    dtype = state.position.dtype
    l_scale = jnp.cbrt(state.box.volume).astype(dtype)

    def box_force(state):
        w = jnp.sum(state.virial * state.mask[:, None, None], axis=0)
        vol = state.box.volume
        stress = w / vol * PRESSURE_UNIT_CONVERSION
        pressure = jnp.trace(stress) / 3.0
        if hydrostatic:
            max_stress = jnp.abs(pressure)
            w = jnp.eye(3, dtype=dtype) * (jnp.trace(w) / 3.0)
        else:
            max_stress = jnp.max(jnp.abs(stress))
        return w / l_scale, max_stress

    def cond(carry):
        state, v, vb, dt, alpha, n_pos, it = carry
        _, max_stress = box_force(state)
        conv = (_fmax(state) < force_tolerance) & (max_stress < stress_tol)
        return (it < max_steps) & (~conv)

    def body(carry):
        state, v, vb, dt, alpha, n_pos, it = carry
        f = state.force * state.mask[:, None]
        fb, _ = box_force(state)
        p = jnp.sum(v * f) + jnp.sum(vb * fb)
        uphill = p <= 0

        grow = (~uphill) & (n_pos > n_min)
        dt_new = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), dt)
        alpha_new = jnp.where(grow, alpha * f_alpha, alpha)
        n_pos_new = jnp.where(uphill, 0, n_pos + 1)
        dt_new = jnp.where(uphill, jnp.maximum(dt * f_dec, dt_min), dt_new)
        alpha_new = jnp.where(uphill, alpha0, alpha_new)
        v = jnp.where(uphill, jnp.zeros_like(v), v)
        vb = jnp.where(uphill, jnp.zeros_like(vb), vb)

        # implicit Euler + velocity mixing on the extended vector
        f_mod = jnp.sqrt(jnp.sum(f * f) + jnp.sum(fb * fb))
        v = v + (dt_new / m) * f
        vb = vb + (dt_new / m) * fb
        v_mod = jnp.sqrt(jnp.sum(v * v) + jnp.sum(vb * vb))
        mix = alpha_new * v_mod / jnp.maximum(f_mod, 1e-30)
        v = (1.0 - alpha_new) * v + mix * f
        vb = (1.0 - alpha_new) * vb + mix * fb

        d_eps = vb * dt_new / l_scale
        h_new = state.box.h + d_eps @ state.box.h
        pos = state.position + dt_new * v + state.position @ d_eps.T
        state = ff.compute(
            state._replace(position=pos, box=state.box.with_h(h_new))
        )
        return state, v, vb, dt_new, alpha_new, n_pos_new, it + 1

    carry = (
        state,
        jnp.zeros_like(state.velocity),
        jnp.zeros((3, 3), dtype),
        jnp.asarray(dt0, dtype),
        jnp.asarray(alpha0, dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    state, _, _, _, _, _, steps = jax.lax.while_loop(cond, body, carry)
    return state, steps
