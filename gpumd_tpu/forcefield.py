"""ForceField: neighbor build + potential dispatch for one MD step.

Plays the role of the reference's `Force` driver (ref: src/force/force.cu:
75-218 parse, 424-631 per-step wrap/zero/dispatch), as a functional object:
`ff(state) -> state` with force / per-atom energy / per-atom virial filled.

Neighbor strategy is chosen once, host-side, from the initial box (small
boxes -> brute force with periodic images; large -> sort-based cell list),
mirroring the reference's small/large-box duality (ref: nep.cu:1356-1389).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
from gpumd_tpu.model.state import MDState
from gpumd_tpu.neighbor.neighbor import (
    NeighborList,
    choose_grid,
    neighbor_brute,
    neighbor_cell_list,
)


@dataclass(frozen=True)
class NeighborConfig:
    rc: float
    mn: int
    method: str  # "brute" | "cell"
    reps: tuple = (0, 0, 0)
    grid: Optional[tuple] = None
    cell_cap: Optional[int] = None

    @staticmethod
    def create(box: Box, rc: float, n_atoms: int, mn: int, skin: float = 0.0):
        """Host-side planning from the initial box (recompiled if box shape
        class changes)."""
        rc_eff = rc + skin
        grid = choose_grid(box, rc_eff)
        if grid is None or n_atoms <= 2048:
            reps = num_replicas_for_cutoff(box, rc_eff)
            return NeighborConfig(rc=rc_eff, mn=mn, method="brute", reps=reps)
        vol_cell = float(box.volume) / (grid[0] * grid[1] * grid[2])
        density = n_atoms / float(box.volume)
        cell_cap = max(8, int(np.ceil(density * vol_cell * 2.0)))
        return NeighborConfig(
            rc=rc_eff, mn=mn, method="cell", grid=grid, cell_cap=cell_cap
        )

    def build(self, position, box: Box, mask) -> NeighborList:
        if self.method == "brute":
            return neighbor_brute(
                position, box, mask, rc=self.rc, mn=self.mn, reps=self.reps
            )
        return neighbor_cell_list(
            position,
            box,
            mask,
            rc=self.rc,
            mn=self.mn,
            grid=self.grid,
            cell_cap=self.cell_cap,
        )


@dataclass(frozen=True)
class ForceField:
    """One or more potentials evaluated on a shared neighbor plan.

    `potentials` entries must expose .compute(type_, nbr, mask) ->
    PotentialOutput and .rc.
    """

    potentials: tuple
    neighbor: NeighborConfig

    @staticmethod
    def create(potentials, box: Box, n_atoms: int, mn: int = 256, skin: float = 0.0):
        rc = max(p.rc for p in potentials)
        cfg = NeighborConfig.create(box, rc, n_atoms, mn=mn, skin=skin)
        return ForceField(potentials=tuple(potentials), neighbor=cfg)

    def compute(self, state: MDState) -> MDState:
        """Wrap positions, rebuild neighbors, evaluate potential(s)."""
        pos = state.box.wrap(state.position)
        nbr = self.neighbor.build(pos, state.box, state.mask)
        e = jnp.zeros_like(state.potential_energy)
        f = jnp.zeros_like(state.force)
        w = jnp.zeros_like(state.virial)
        for pot in self.potentials:
            out = pot.compute(state.type, nbr, state.mask)
            e = e + out.energy
            f = f + out.force
            w = w + out.virial
        # Per-atom heat current J_i = W_i . v_i (ref: compute_heat.cu:18-29).
        j = jnp.einsum("nab,nb->na", w, state.velocity)
        return state._replace(
            position=pos, force=f, potential_energy=e, virial=w, heat_current=j
        )
