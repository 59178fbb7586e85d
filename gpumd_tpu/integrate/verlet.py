"""Velocity-Verlet half-steps (the primitive every ensemble shares).

Matches the reference's gpu_velocity_verlet (ref: src/integrate/ensemble.cu:
113-214): step 1 kicks v by dt/2 and drifts x by dt; step 2 kicks v by dt/2.
Fixed-group (v = 0) and move-group support enter as an optional per-atom
`mobile` mask, fused into the update like the reference fuses them into the
kernel.

dt is in natural time units (fs / TIME_UNIT_CONVERSION).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpumd_tpu.model.state import MDState


def _apply_pin(v, pinned):
    if pinned is None:
        return v
    import jax.numpy as _jnp

    mask, vel = pinned
    return _jnp.where(mask[:, None] > 0, _jnp.asarray(vel, v.dtype)[None, :], v)


def velocity_verlet_step1(
    state: MDState, dt, mobile=None, pinned=None, kick=True, drift=True
) -> MDState:
    """kick/drift toggles let split-operator ensembles (MTTK) interleave
    box propagation between the dt/2 kick and the dt drift."""
    if kick:
        inv_m = 1.0 / state.mass
        v = state.velocity + (0.5 * dt) * state.force * inv_m[:, None]
        if mobile is not None:
            v = v * mobile[:, None]
        v = _apply_pin(v, pinned)
    else:
        v = state.velocity
    if not drift:
        return state._replace(velocity=v)
    dx = dt * v
    pos = state.position + dx
    unwrapped = (
        state.unwrapped_position + dx
        if state.unwrapped_position is not None
        else None
    )
    return state._replace(position=pos, velocity=v, unwrapped_position=unwrapped)


def velocity_verlet_step2(state: MDState, dt, mobile=None, pinned=None) -> MDState:
    inv_m = 1.0 / state.mass
    v = state.velocity + (0.5 * dt) * state.force * inv_m[:, None]
    if mobile is not None:
        v = v * mobile[:, None]
    v = _apply_pin(v, pinned)
    return state._replace(velocity=v, step=state.step + 1)
