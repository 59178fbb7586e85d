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


def make_md_step(
    ff: ForceField,
    ensemble,
    dt,
    observer: Optional[Callable] = None,
    drivers: tuple = (),
):
    """Build the per-step scan body. `observer(state) -> pytree` is stacked
    over steps (default: thermo).  `drivers` are external force drivers
    (add_force/add_efield/electron_stop/...) applied after the force pass,
    where the reference's run loop applies them (ref: run.cu:289-293).

    Carry = (state, ensemble aux, neighbor cache): the Verlet-list cache
    rides the scan so neighbor rebuilds happen only on the displacement
    trigger (ff.skin > 0), not every step as in the reference.
    """

    obs = observer if observer is not None else (lambda s: compute_thermo(s))
    import inspect

    obs_wants_aux = len(inspect.signature(obs).parameters) >= 2

    def step(carry, _):
        state, aux, cache = carry
        state, aux = ensemble.step1(state, aux, dt)
        if ff.skin > 0.0:
            state, cache = ff.compute_cached(state, cache)
        else:
            state = ff.compute(state)
        for drv in drivers:
            state = drv.apply(state)
        state, aux = ensemble.step2(state, aux, dt)
        out = obs(state, aux) if obs_wants_aux else obs(state)
        return (state, aux, cache), out

    return step


class MDRunner:
    """A compiled MD run block.

    Build once, call many times: the jitted executable is cached on the
    instance (recreating the closure per call would retrace every time).
    """

    def __init__(
        self,
        ff: ForceField,
        ensemble,
        dt,
        n_steps: int,
        observer: Optional[Callable] = None,
        drivers: tuple = (),
    ):
        self.ensemble = ensemble
        self.ff = ff
        self.n_steps = n_steps
        step = make_md_step(ff, ensemble, dt, observer, drivers)

        @jax.jit
        def _run(state, aux, cache):
            return jax.lax.scan(step, (state, aux, cache), length=n_steps)

        self._run = _run

    def __call__(self, state: MDState, aux=None, cache=None):
        """Returns (state, (aux, cache), observations); pass the carry back
        in to continue a run across chunks."""
        if aux is None:
            aux = self.ensemble.init(state)
        if cache is None and self.ff.skin > 0.0:
            cache = jax.jit(self.ff.refresh_cache)(state)
        (state, aux, cache), obs = self._run(state, aux, cache)
        return state, (aux, cache), obs


def md_run(
    state: MDState,
    ff: ForceField,
    ensemble,
    dt,
    n_steps: int,
    observer: Optional[Callable] = None,
):
    """One-shot convenience wrapper around MDRunner (compiles each call;
    use MDRunner directly in loops/benchmarks).

    The initial force evaluation (run.cu:236) is the caller's job:
    `state = ff.compute(state)` before the first run block, as in the
    reference.
    """
    return MDRunner(ff, ensemble, dt, n_steps, observer)(state)
