"""Box deformation wrapper: strain-rate box stretching for tensile tests.

run.in: `deform rate [rx ry rz] dx dy dz` (A/step on flagged directions,
ref: integrate.cu:1381-1420; applied in the ensembles' velocity_verlet_2
like ensemble_ber.cu:93-105: box length += rate, positions scaled).
Wraps any inner ensemble.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class DeformWrapper:
    inner: object
    rate: Tuple[float, float, float]  # A/step per direction (0 = off)

    def init(self, state):
        return self.inner.init(state)

    def step1(self, state, aux, dt):
        return self.inner.step1(state, aux, dt)

    def step2(self, state, aux, dt):
        state, aux = self.inner.step2(state, aux, dt)
        h = state.box.h
        lengths = jnp.diagonal(h)
        rate = jnp.asarray(self.rate, h.dtype)
        scale = (lengths + rate) / lengths
        box = state.box.with_h(h * scale[None, :])
        pos = state.position * scale[None, :]
        unwrapped = (
            state.unwrapped_position * scale[None, :]
            if state.unwrapped_position is not None else None
        )
        return (
            state._replace(position=pos, box=box, unwrapped_position=unwrapped),
            aux,
        )
