"""System thermodynamic observables (the reference's find_thermo,
ref: src/integrate/ensemble.cu:434-674).

Thermo vector: temperature (K), kinetic energy (eV), potential energy (eV),
and the 3x3 pressure tensor (eV/A^3; multiply by PRESSURE_UNIT_CONVERSION
for GPa):  P = (sum_i m_i v_i (x) v_i + sum_i W_i) / V.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B


class Thermo(NamedTuple):
    temperature: jnp.ndarray  # () K
    kinetic_energy: jnp.ndarray  # () eV
    potential_energy: jnp.ndarray  # () eV
    pressure: jnp.ndarray  # (3, 3) eV/A^3


def compute_thermo(state: MDState, ndof=None) -> Thermo:
    m = state.mask
    ke = 0.5 * jnp.sum(
        state.mass * jnp.sum(state.velocity**2, axis=-1) * m
    )
    pe = jnp.sum(state.potential_energy * m)
    n = jnp.sum(m)
    dof = 3.0 * n if ndof is None else ndof
    temp = 2.0 * ke / (dof * K_B)
    kin_tensor = jnp.einsum(
        "n,na,nb->ab", state.mass * m, state.velocity, state.velocity,
            precision=jax.lax.Precision.HIGHEST,
    )
    w = jnp.einsum("nab,n->ab", state.virial, m,
                   precision=jax.lax.Precision.HIGHEST)
    pressure = (kin_tensor + w) / state.box.volume
    return Thermo(
        temperature=temp, kinetic_energy=ke, potential_energy=pe, pressure=pressure
    )
