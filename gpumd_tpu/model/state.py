"""MD simulation state as a functional JAX pytree.

The reference keeps per-atom state as a struct of GPU arrays mutated in
place (ref: src/model/atom.cuh:21-52).  Here the state is an immutable
NamedTuple threaded through `lax.scan`; "mutation" is `state._replace(...)`.

Array layout is (N, 3) rather than the reference's stride-N SoA — XLA lays
out and fuses (N, 3) gathers fine, and it keeps vmap/sharding natural.
Virial is (N, 3, 3) full tensor (the reference's 9xN, Fan2015 convention).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gpumd_tpu.model.box import Box


class MDState(NamedTuple):
    """Per-atom dynamic state plus the box.

    All arrays are padded to a static N_pad; `mask` marks real atoms.
    """

    position: jnp.ndarray  # (N, 3)
    velocity: jnp.ndarray  # (N, 3) natural units
    force: jnp.ndarray  # (N, 3) eV/A
    mass: jnp.ndarray  # (N,)
    type: jnp.ndarray  # (N,) int32 potential type index
    box: Box
    potential_energy: jnp.ndarray  # (N,) per-atom eV
    virial: jnp.ndarray  # (N, 3, 3) eV
    heat_current: jnp.ndarray  # (N, 3) per-atom heat current (virial . v)
    mask: jnp.ndarray  # (N,) 1.0 for real atoms, 0.0 for padding
    charge: Optional[jnp.ndarray] = None  # (N,) for qNEP
    unwrapped_position: Optional[jnp.ndarray] = None  # (N, 3) for MSD
    step: jnp.ndarray = None  # () int32
    # Kahan/TwoSum compensation (low parts) for extended-precision f32
    # integration: the true value is position + position_c.  The reference
    # integrates in f64 (ref: src/model/atom.cuh:30-37); on TPU f64 is
    # emulated, so the Verlet updates instead accumulate with exact TwoSum
    # error terms when these are present (see integrate/verlet.py), which
    # removes the per-step rounding bias that dominates f32 NVE drift.
    position_c: Optional[jnp.ndarray] = None  # (N, 3)
    velocity_c: Optional[jnp.ndarray] = None  # (N, 3)

    @property
    def n_pad(self) -> int:
        return self.position.shape[0]

    @property
    def n_atoms(self):
        return jnp.sum(self.mask).astype(jnp.int32)

    def kinetic_energy(self):
        """Total kinetic energy in eV (natural velocity units make
        KE = 1/2 m v^2 directly in eV)."""
        v2 = jnp.sum(self.velocity**2, axis=-1)
        return 0.5 * jnp.sum(self.mass * v2 * self.mask)

    def temperature(self):
        """Instantaneous temperature in K from 3N degrees of freedom."""
        from gpumd_tpu.units import K_B

        n = jnp.maximum(jnp.sum(self.mask), 1.0)
        return 2.0 * self.kinetic_energy() / (3.0 * n * K_B)


def make_state(
    position,
    mass,
    type_,
    box: Box,
    velocity=None,
    charge=None,
    n_pad: Optional[int] = None,
    track_unwrapped: bool = False,
    dtype=None,
    compensated: bool = False,
) -> MDState:
    """Build an MDState, padding all per-atom arrays to n_pad.

    Padding atoms are parked at the origin with zero mass contribution via
    `mask`; potentials must multiply per-atom outputs by mask.
    """
    position = jnp.asarray(position, dtype=dtype)
    n = position.shape[0]
    if n_pad is None:
        n_pad = n
    if n_pad < n:
        raise ValueError(f"n_pad={n_pad} < n_atoms={n}")
    pad = n_pad - n
    rdt = position.dtype

    def padv(x, fill=0.0):
        x = jnp.asarray(x)
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    position = padv(position)
    mass = padv(jnp.asarray(mass, dtype=rdt), fill=1.0)
    type_ = padv(jnp.asarray(type_, dtype=jnp.int32))
    velocity = (
        padv(jnp.asarray(velocity, dtype=rdt))
        if velocity is not None
        else jnp.zeros((n_pad, 3), rdt)
    )
    mask = jnp.concatenate([jnp.ones((n,), rdt), jnp.zeros((pad,), rdt)])
    return MDState(
        position=position,
        velocity=velocity,
        force=jnp.zeros((n_pad, 3), rdt),
        mass=mass,
        type=type_,
        box=box,
        potential_energy=jnp.zeros((n_pad,), rdt),
        virial=jnp.zeros((n_pad, 3, 3), rdt),
        heat_current=jnp.zeros((n_pad, 3), rdt),
        mask=mask,
        charge=padv(jnp.asarray(charge, dtype=rdt)) if charge is not None else None,
        unwrapped_position=position if track_unwrapped else None,
        step=jnp.zeros((), jnp.int32),
        position_c=jnp.zeros((n_pad, 3), rdt) if compensated else None,
        velocity_c=jnp.zeros((n_pad, 3), rdt) if compensated else None,
    )
