"""Velocity-Verlet half-steps (the primitive every ensemble shares).

Matches the reference's gpu_velocity_verlet (ref: src/integrate/ensemble.cu:
113-214): step 1 kicks v by dt/2 and drifts x by dt; step 2 kicks v by dt/2.
Fixed-group (v = 0) and move-group support enter as an optional per-atom
`mobile` mask, fused into the update like the reference fuses them into the
kernel.

When the state carries compensation arrays (`position_c`/`velocity_c`, see
model/state.py), the updates accumulate with exact TwoSum error terms so the
effective integration precision is ~f64 while forces stay f32.  The f32
per-step increments (v*dt ~ 1e-4 of |x|, dv ~ 1e-3 of |v|) otherwise lose
~1e-3 of each increment to biased rounding, which is what dominates long-run
NVE energy drift (the reference avoids this by integrating in f64,
ref: src/model/atom.cuh:30-37).

dt is in natural time units (fs / TIME_UNIT_CONVERSION).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpumd_tpu.model.state import MDState


def two_sum_acc(x, c, dx):
    """Accumulate dx into the extended-precision pair (x, c).

    Returns (x', c') with x' + c' = x + c + dx up to O(eps^2): Kahan feeds
    the carried compensation into the increment, then a full TwoSum captures
    the exact rounding error of the high-part addition (no magnitude-order
    assumption, unlike Fast2Sum).
    """
    y = dx + c
    t = x + y
    z = t - x
    err = (x - (t - z)) + (y - z)
    return t, err


def _apply_pin(v, pinned):
    if pinned is None:
        return v
    import jax.numpy as _jnp

    mask, vel = pinned
    return _jnp.where(mask[:, None] > 0, _jnp.asarray(vel, v.dtype)[None, :], v)


def _kick(state: MDState, dt_half, mobile, pinned):
    """dt/2 velocity kick, compensated when velocity_c is present."""
    inv_m = 1.0 / state.mass
    dv = dt_half * state.force * inv_m[:, None]
    vc = state.velocity_c
    if vc is not None:
        v, vc = two_sum_acc(state.velocity, vc, dv)
    else:
        v = state.velocity + dv
    if mobile is not None:
        v = v * mobile[:, None]
        if vc is not None:
            vc = vc * mobile[:, None]
    if pinned is not None:
        v = _apply_pin(v, pinned)
        if vc is not None:
            vc = jnp.where(pinned[0][:, None] > 0, 0.0, vc)
    return v, vc


def velocity_verlet_step1(
    state: MDState, dt, mobile=None, pinned=None, kick=True, drift=True
) -> MDState:
    """kick/drift toggles let split-operator ensembles (MTTK) interleave
    box propagation between the dt/2 kick and the dt drift."""
    if kick:
        v, vc = _kick(state, 0.5 * dt, mobile, pinned)
    else:
        v, vc = state.velocity, state.velocity_c
    if not drift:
        return state._replace(velocity=v, velocity_c=vc)
    dx = dt * v
    pc = state.position_c
    if pc is not None:
        pos, pc = two_sum_acc(state.position, pc, dx)
        # the low part of the velocity advances the position too (dt*vc is
        # below one ulp of dx; fold it straight into the compensation)
        pc = pc + dt * vc
    else:
        pos = state.position + dx
    unwrapped = (
        state.unwrapped_position + dx
        if state.unwrapped_position is not None
        else None
    )
    return state._replace(
        position=pos, velocity=v, unwrapped_position=unwrapped,
        position_c=pc, velocity_c=vc,
    )


def velocity_verlet_step2(state: MDState, dt, mobile=None, pinned=None) -> MDState:
    v, vc = _kick(state, 0.5 * dt, mobile, pinned)
    return state._replace(velocity=v, velocity_c=vc, step=state.step + 1)
