"""The MD hot loop: one fused jit with `lax.scan` over steps.

The reference's loop (ref: src/main_gpumd/run.cu:252-318) launches a chain
of kernels per step from the host; here the whole run block is one XLA
program — integrate-1, neighbor rebuild, forces, integrate-2, on-device
observables — with host I/O only at dump intervals (handled by the caller
on the stacked per-sample outputs, or via io_callback in the app driver).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.thermo import Thermo, compute_thermo
from gpumd_tpu.model.state import MDState


def make_md_step(ff: ForceField, ensemble, dt, observer: Optional[Callable] = None):
    """Build the per-step scan body. `observer(state) -> pytree` is stacked
    over steps (default: thermo)."""

    obs = observer if observer is not None else (lambda s: compute_thermo(s))

    def step(carry, _):
        state, aux = carry
        state, aux = ensemble.step1(state, aux, dt)
        state = ff.compute(state)
        state, aux = ensemble.step2(state, aux, dt)
        return (state, aux), obs(state)

    return step


def md_run(
    state: MDState,
    ff: ForceField,
    ensemble,
    dt,
    n_steps: int,
    observer: Optional[Callable] = None,
):
    """Run n_steps of MD; returns (final_state, aux, stacked observations).

    The initial force evaluation (run.cu:236) is included if the state has
    never seen a force pass (caller should do `state = ff.compute(state)`
    once before the first run block, as the reference does).

    The whole block is one jit; re-calling with the same (ff, ensemble,
    n_steps) structure reuses the XLA executable via jax's tracing cache on
    the closed-over step function.
    """
    step = make_md_step(ff, ensemble, dt, observer)

    @jax.jit
    def _run(state):
        aux = ensemble.init(state)
        return jax.lax.scan(step, (state, aux), length=n_steps)

    (state, aux), obs = _run(state)
    return state, aux, obs
