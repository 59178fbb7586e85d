"""External per-step force drivers: add_force / add_efield /
add_random_force / electron_stop.

These run after the force pass and before integrate-2, exactly where the
reference's run loop applies them (ref: src/main_gpumd/run.cu:289-293).
Each driver is a frozen dataclass with `apply(state) -> state`; the step
index comes from `state.step` (already threaded through the scan carry),
and stochastic drivers derive a per-step key via `jax.random.fold_in` —
no extra carry needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AddForce:
    """add_force <gm> <gid> fx fy fz | add_force <gm> <gid> <file>
    (ref: add_force.cu:73-162): constant or per-step-tabulated force on a
    group, table indexed by step %% table_length."""

    gmask: object  # (N,) 1.0 on driven atoms
    table: object  # (L, 3) force table

    def apply(self, state):
        table = jnp.asarray(self.table, state.force.dtype)
        row = table[state.step % table.shape[0]]
        gm = jnp.asarray(self.gmask, state.force.dtype)
        f = state.force + gm[:, None] * row[None, :]
        return state._replace(force=f * state.mask[:, None])


@dataclass(frozen=True)
class AddEfield:
    """add_efield <gm> <gid> Ex Ey Ez [mode] (ref: add_efield.cu):
    F += q E (charge mode) or F += Z* E with the per-atom BEC tensor
    (bec mode, qNEP models)."""

    gmask: object
    table: object  # (L, 3) E-field table (V/A)
    use_bec: bool = False
    # bec mode: callable state -> (N, 3, 3) Born tensors (set by the app
    # from the loaded qNEP; evaluated per step like the reference's
    # BEC-aware field kernel, ref: add_efield.cu bec branch)
    bec_fn: Optional[object] = None

    def apply(self, state):
        table = jnp.asarray(self.table, state.force.dtype)
        ef = table[state.step % table.shape[0]]
        gm = jnp.asarray(self.gmask, state.force.dtype)
        if self.use_bec:
            if self.bec_fn is None:
                raise ValueError("add_efield bec mode needs a qNEP model")
            z = self.bec_fn(state)  # (N, 3, 3)
            add = jnp.einsum("nab,b->na", z, ef)
            f = state.force + gm[:, None] * add
            return state._replace(force=f * state.mask[:, None])
        if state.charge is None:
            raise ValueError("add_efield needs charges (model.xyz or qNEP)")
        add = state.charge[:, None] * ef[None, :]
        f = state.force + gm[:, None] * add
        return state._replace(force=f * state.mask[:, None])


@dataclass(frozen=True)
class AddRandomForce:
    """add_random_force <variance> (ref: add_random_force.cu:118-145):
    Gaussian force with the given variance on every atom, net force
    removed (momentum conserving)."""

    variance: float
    seed: int = 20240813

    def apply(self, state):
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), state.step)
        dtype = state.force.dtype
        noise = jnp.sqrt(jnp.asarray(self.variance, dtype)) * jax.random.normal(
            key, state.force.shape, dtype
        )
        noise = noise * state.mask[:, None]
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
        noise = noise - jnp.sum(noise, axis=0) / n_real
        f = state.force + noise
        return state._replace(force=f * state.mask[:, None])


@dataclass(frozen=True)
class ElectronStop:
    """electron_stop <file> (ref: electron_stop.cu): velocity-antiparallel
    stopping force from a per-type tabulated stopping power S(E_kin),
    linearly interpolated; the mean stopping force is subtracted from all
    atoms to conserve momentum."""

    table: object  # (num_types, num_points) stopping power
    energy_min: float
    energy_max: float

    def apply(self, state):
        dtype = state.velocity.dtype
        table = jnp.asarray(self.table, dtype)
        npts = table.shape[1]
        v2 = jnp.sum(state.velocity**2, axis=-1)
        energy = 0.5 * state.mass * v2
        interval = (self.energy_max - self.energy_min) / (npts - 1)
        frac = (energy - self.energy_min) / interval
        il = jnp.clip(frac.astype(jnp.int32), 0, npts - 2)
        wr = jnp.clip(frac - il, 0.0, 1.0)
        sp_rows = table[state.type]  # (N, npts)
        sl = jnp.take_along_axis(sp_rows, il[:, None], axis=1)[:, 0]
        sr = jnp.take_along_axis(sp_rows, (il + 1)[:, None], axis=1)[:, 0]
        sp = sl * (1.0 - wr) + sr * wr
        inside = (
            (energy >= self.energy_min + 1e-6)
            & (energy <= self.energy_max - 1e-6)
            & (state.mask > 0)
        )
        factor = jnp.where(
            inside, -sp * jax.lax.rsqrt(jnp.maximum(v2, 1e-30)), 0.0
        )
        fs = factor[:, None] * state.velocity
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
        fs = (fs - jnp.sum(fs, axis=0) / n_real) * state.mask[:, None]
        return state._replace(force=state.force + fs)

    @staticmethod
    def from_file(path, num_types):
        """Stopping-power file: first line 'num_points emin emax', then
        num_points rows of num_types values (ref: electron_stop.cu parse)."""
        with open(path) as f:
            toks = f.read().split()
        npts = int(toks[0])
        emin, emax = float(toks[1]), float(toks[2])
        vals = np.asarray([float(x) for x in toks[3 : 3 + npts * num_types]])
        table = vals.reshape(npts, num_types).T  # (num_types, npts)
        return ElectronStop(table=table, energy_min=emin, energy_max=emax)


def parse_table_or_values(args, workdir="."):
    """Shared 'fx fy fz' vs 'filename' parsing for add_force/add_efield
    (ref: add_force.cu:110-155): table file = first line num_rows, then
    rows of 3 values."""
    import os

    if len(args) == 3:
        return np.asarray([[float(a) for a in args]])
    if len(args) == 1:
        path = args[0]
        if not os.path.isabs(path):
            path = os.path.join(workdir, path)
        with open(path) as f:
            toks = f.read().split()
        n = int(toks[0])
        vals = np.asarray([float(x) for x in toks[1 : 1 + 3 * n]])
        return vals.reshape(n, 3)
    raise ValueError("expected 'fx fy fz' or a table filename")


@dataclass(frozen=True)
class AddSpring:
    """add_spring ghost_com <gm> <gid> vx vy vz couple k R0 x0 y0 z0 |
    ... decouple kx ky kz x0 y0 z0 (ref: add_spring.cu MODE_GHOST_COM):
    a ghost anchor starts at the group's initial COM + offset and moves at
    `velocity` A/step; the spring force on the anchor-COM separation is
    distributed mass-weighted over the group (SMD pulling)."""

    gmask: object  # (N,) 1.0 on pulled atoms
    com0: object  # (3,) group COM at registration
    velocity: object  # (3,) A/step
    offset: object  # (3,)
    couple: bool = True
    k: float = 0.0  # couple spring constant
    r0: float = 0.0  # couple rest length
    k3: object = (0.0, 0.0, 0.0)  # decouple constants

    def apply(self, state):
        dtype = state.force.dtype
        gm = jnp.asarray(self.gmask, dtype)
        m = state.mass * gm
        msum = jnp.maximum(jnp.sum(m), 1e-30)
        pos = (state.unwrapped_position
               if state.unwrapped_position is not None else state.position)
        com = jnp.sum(m[:, None] * pos, axis=0) / msum
        ghost = (
            jnp.asarray(self.com0, dtype) + jnp.asarray(self.offset, dtype)
            + jnp.asarray(self.velocity, dtype) * state.step.astype(dtype)
        )
        d = ghost - com
        if self.couple:
            r = jnp.sqrt(jnp.maximum(jnp.sum(d * d), 1e-40))
            f_tot = jnp.where(
                r > 1e-20, self.k * (r - self.r0) / r, 0.0
            ) * d
        else:
            f_tot = jnp.asarray(self.k3, dtype) * d
        f = state.force + (m / msum)[:, None] * f_tot[None, :]
        return state._replace(force=f * state.mask[:, None])
