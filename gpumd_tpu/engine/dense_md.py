"""Fused MD loop on the dense cell-grid state (the throughput path).

The reference's hot loop launches a kernel chain per step from the host
(ref: src/main_gpumd/run.cu:252-318); here one `lax.scan` carries the
slot-ordered MDState, a drift-triggered re-sort replaces neighbor-list
rebuilds, and the force pass is a fused Pallas engine:

  * engine="compact" (default, round 3): compact gathered neighbor tiles —
    engine/nep_compact.py.  Also rebuilds the per-atom window index tiles
    at each rebin (the analog of the reference's neighbor list rebuild,
    amortized by the Verlet skin).
  * engine="v2": round-2 dense window engine (engine/nep_dense.py), kept
    as the fallback for configurations the compact plan rejects.

State lives PERMUTED (sorted by cell) between rebins: integration is
elementwise so it does not care, rebinning is one gather of the state
arrays every ~skin/(2 v_max dt) steps, and `orig_id` rides along so
observers can map back to input order.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.engine.grid import (
    DenseGridPlan,
    apply_perm,
    bin_dense,
    pack_ghost,
    plan_grid,
)
from gpumd_tpu.engine.nep_compact import (
    CompactPlan,
    block_centers,
    build_indices,
    compact_nep_compute,
    make_compact_plan,
    pack_block_windows,
)
from gpumd_tpu.engine.nep_dense import dense_nep_compute_v2
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import MDState, make_state
from gpumd_tpu.potentials.nep.model import NEP


class DenseCarry(NamedTuple):
    state: MDState  # slot-ordered, n_slots rows
    orig_id: jnp.ndarray  # (n_slots,) int32 input-order index (or n for empty)
    ref_frac: jnp.ndarray  # (n_slots, 3) FRACTIONAL positions at last rebin
    ref_thick: jnp.ndarray  # (3,) box thicknesses at last rebin
    overflow: jnp.ndarray  # sticky bool: cap/MN overflow (results invalid)
    idx: Optional[jnp.ndarray] = None  # compact neighbor tiles (engine=compact)


class DenseNEPMD:
    """NEP MD driver on the dense grid. Build once per (box shape, N)."""

    def __init__(
        self,
        nep: NEP,
        box: Box,
        n_atoms: int,
        position: Optional[np.ndarray] = None,
        skin: float = 1.0,
        cap: Optional[int] = None,
        interpret: Optional[bool] = None,
        engine: str = "auto",
        per_atom_virial: bool = False,
        mn_r: Optional[int] = None,
        mn_a: Optional[int] = None,
        zero_net_force: bool = True,
        compact_lists: Optional[bool] = None,
    ):
        self.nep = nep
        # Analytically the net force is exactly zero (translation
        # invariance); numerically the i-side/j-side halves of each pair
        # round differently (f32), and the per-step-resampled residual
        # random-walks the total momentum (round-3: 2e-3 amu*A/fs after
        # 6 ps at 32k, vs the reference's 1e-3 gate,
        # ref tests_pytest/test_md_conservation.py:34).  Subtracting the
        # mean net force per step restores exact global Newton-III at the
        # cost of one 3-component reduction (~1e-7 eV/A per atom at 1M —
        # far below force tolerances).
        self.zero_net_force = zero_net_force
        if engine in ("auto", "compact") and cap is None:
            from gpumd_tpu.engine.nep_compact import plan_grid_compact

            self.plan = plan_grid_compact(
                box, nep.model.rc_radial_max, skin, n_atoms,
                position=position,
            )
        else:
            self.plan = plan_grid(
                box, nep.model.rc_radial_max, skin, n_atoms,
                position=position, cap=cap,
            )
        if self.plan is None:
            raise ValueError("box too thin for the dense engine (needs >= 3 "
                             "cells of rc+skin per periodic direction)")
        self.skin = skin
        self.interpret = interpret
        if engine == "auto":
            # compact when the model qualifies, else round-2 dense window
            from gpumd_tpu.engine.nep_compact import CompactSpec
            try:
                CompactSpec.from_model(nep.model, nep.params)
                engine = "compact"
            except NotImplementedError:
                engine = "v2"
        self.engine = engine
        self.per_atom_virial = per_atom_virial and engine == "compact"
        self.hnemd_fe: Optional[tuple] = None  # set by the app for HNEMD
        self.cplan: Optional[CompactPlan] = None
        if compact_lists is None:
            # env escape hatch: GPUMD_COMPACT_LISTS=0 restores the round-4
            # full-window gather sources (bench.py's mid-level fallback)
            import os as _os
            compact_lists = _os.environ.get(
                "GPUMD_COMPACT_LISTS", "1") != "0"
        if engine == "compact":
            self.cplan = make_compact_plan(
                self.plan, position=position, box=box,
                rc_angular=nep.model.rc_angular_max, mn_r=mn_r, mn_a=mn_a,
                compact_lists=compact_lists,
            )

    # ---- state management ----------------------------------------------------

    def _build_idx(self, sstate: MDState):
        garr = pack_ghost(
            sstate.position, sstate.type, sstate.mask, sstate.box, self.plan
        )
        if self.cplan.cl:
            interpret = self.interpret
            if interpret is None:
                interpret = jax.default_backend() != "tpu"
            from gpumd_tpu.engine.nep_compact import build_compact_neighbors

            return build_compact_neighbors(
                garr, sstate.box, self.cplan,
                self.nep.model.rc_angular_max, interpret)
        centers = block_centers(garr, self.cplan)
        cand = pack_block_windows(garr, self.plan, self.cplan.bx,
                                  self.cplan.wl)
        return build_indices(centers, cand, self.cplan,
                             self.nep.model.rc_angular_max)

    def _measure_bands(self, neigh):
        """Bake banded-gather source-block bands into the plan from the
        init-time CONCRETE build (nep_compact.measure_bands).  Later jits
        (make_step / compact_pipeline closures read self.cplan) then scan
        only the measured bands; every rebuild re-checks membership and
        aborts loudly on drift past the slack.  No-ops under tracing, when
        compact lists are off, or with GPUMD_BANDED=0."""
        import os as _os

        if (not self.cplan or not self.cplan.cl
                or _os.environ.get("GPUMD_BANDED", "1") == "0"
                or isinstance(neigh.idx, jax.core.Tracer)):
            return
        from gpumd_tpu.engine.nep_compact import measure_bands

        pad = int(_os.environ.get("GPUMD_BAND_PAD", "1"))
        bp, bc = measure_bands(neigh, self.cplan, pad=pad)
        self.cplan = self.cplan._replace(bands_pair=bp, bands_cidx=bc)

    def init_carry(self, state: MDState) -> DenseCarry:
        """Input-order MDState (N rows) -> slot-ordered carry."""
        n = state.position.shape[0]
        sstate, orig_id, overflow = self._rebin_arrays(
            state, jnp.arange(n, dtype=jnp.int32), state.box
        )
        idx = None
        if self.engine == "compact":
            idx, ok = self._build_idx(sstate)
            overflow = overflow | ~ok
            self._measure_bands(idx)
        overflow = overflow | ~self._cells_valid(sstate.box)
        return DenseCarry(
            state=sstate,
            orig_id=orig_id,
            ref_frac=sstate.box.fractional(sstate.position),
            ref_thick=sstate.box.thickness(),
            overflow=overflow,
            idx=idx,
        )

    def _cells_valid(self, box: Box):
        """Cells must be >= rc+skin thick AT BUILD time for the 3^3 window
        to cover the list cutoff (between builds the affine Verlet
        criterion in make_step covers box drift).  A barostat that shrinks
        the box below this margin invalidates the static grid plan — flag
        it loudly (sticky overflow), like the reference's neighbor-overflow
        abort.

        Single-cell NON-periodic dims are exempt: all atoms share the one
        cell, so the stencil trivially covers every neighbor regardless of
        extent (thin sheets — BASELINE config 4's graphene, Lz = 3.35 A).
        """
        t = box.thickness()
        grid = jnp.asarray(self.plan.grid, t.dtype)
        exempt = jnp.asarray([
            (not p) and g == 1
            for p, g in zip(self.plan.pbc, self.plan.grid)
        ])
        ratio = jnp.where(exempt, jnp.inf, t / grid)
        return jnp.min(ratio) >= self.plan.rc + self.plan.skin - 1e-9

    def _rebin_arrays(self, state: MDState, orig_id, box):
        pos_w = box.wrap(state.position)
        perm, slot_mask, overflow = bin_dense(pos_w, box, state.mask, self.plan)
        g = lambda a, fill=0.0: apply_perm(a, perm, fill)
        sstate = state._replace(
            position=g(pos_w, 0.0),
            velocity=g(state.velocity),
            force=g(state.force),
            mass=g(state.mass, 1.0),
            type=g(state.type.astype(jnp.int32), 0),
            potential_energy=g(state.potential_energy),
            virial=g(state.virial),
            heat_current=g(state.heat_current),
            mask=slot_mask,
            unwrapped_position=(
                g(state.unwrapped_position)
                if state.unwrapped_position is not None else None
            ),
            # compensation low parts ride along; the PBC wrap above shifts
            # the high part by one (f32-rounded) lattice vector, which is
            # consistent with MIC to one ulp — the low part stays valid.
            position_c=(
                g(state.position_c)
                if state.position_c is not None else None
            ),
            velocity_c=(
                g(state.velocity_c)
                if state.velocity_c is not None else None
            ),
        )
        new_id = apply_perm(orig_id, perm, fill=0)
        new_id = jnp.where(slot_mask > 0, new_id, orig_id.shape[0])
        return sstate, new_id, overflow

    # ---- force pass ----------------------------------------------------------

    def compute(self, state: MDState, idx=None) -> MDState:
        if self.engine == "compact":
            out = compact_nep_compute(
                state.position, state.type, state.mask, state.box,
                self.cplan, idx, self.nep.model, self.nep.params,
                per_atom_virial=self.per_atom_virial,
                interpret=self.interpret,
                temperature=self.nep.temperature,
            )
            f = out.force
            if out.virial_atom is not None:
                w = out.virial_atom
            else:
                n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
                w = (out.virial_total / n_real) * state.mask[:, None, None]
            if self.zero_net_force and self.hnemd_fe is None:
                n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
                f = (f - jnp.sum(f, axis=0) / n_real) * state.mask[:, None]
            if self.hnemd_fe is not None:
                # homogeneous driving force F_i += W_i^T Fe with net-force
                # correction (ref: src/force/force.cu:567-608); requires
                # per_atom_virial=True (the app enforces this).
                fe = jnp.asarray(self.hnemd_fe, dtype=f.dtype)
                f = f + jnp.einsum("nba,b->na", w, fe) * state.mask[:, None]
                n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
                f = (f - jnp.sum(f, axis=0) / n_real) * state.mask[:, None]
            # J_i = W_i v_i, elementwise multiply-sum (VPU, full precision:
            # a dot_general here would run the MXU's DEFAULT bf16 pass)
            j = jnp.sum(w * state.velocity[:, None, :], axis=2)
            return state._replace(
                force=f,
                potential_energy=out.energy * state.mask,
                virial=w,
                heat_current=j,
            )
        out = dense_nep_compute_v2(
            state.position, state.type, state.mask, state.box,
            self.plan, self.nep.model, self.nep.params,
            interpret=self.interpret,
        )
        # total virial spread uniformly over real atoms: pressure/thermo are
        # exact; per-atom heat-current observables need engine="compact".
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
        w = (out.virial_total / n_real) * state.mask[:, None, None]
        f = out.force
        if self.zero_net_force:
            f = (f - jnp.sum(f, axis=0) / n_real) * state.mask[:, None]
        return state._replace(
            force=f, potential_energy=out.energy * state.mask,
            virial=w,
        )

    # ---- MD step -------------------------------------------------------------

    def make_step(self, ensemble, dt, observer=None, measure=None):
        """observer(state) -> small pytree collected per step (scan ys) —
        on-device per-step observables (HNEMD heat current windows).

        measure(maccs, state, orig_id) -> maccs — carried on-device
        measurement accumulators (SHC correlation ring buffers etc.);
        when given, the scan carry is (DenseCarry, aux, maccs) and the
        update runs after step2, matching the reference's
        measure.process-after-integrate ordering (run.cu:295-299).

        Rebuild criterion (barostat-safe): the list built at the last rebin
        (box h0, positions p0, cutoff rc_out = rc+skin) stays complete while
        2*u_max <= smin*rc_out - rc, where u_i = p_i - h s0_i is the
        NON-AFFINE displacement (the barostat's homogeneous rescale drops
        out exactly in fractional coordinates) and smin = min axis scale
        since the rebin: a pair absent from the list had d0 >= rc_out, so
        its distance now is >= smin*rc_out - 2*u_max > rc.  With a fixed box
        (smin = 1) this reduces to the classic skin/2 criterion.  The
        reference instead rebuilds its cell list from scratch every step
        under every ensemble (run.cu:252-318) — amortization is the
        TPU-side replacement, so it must stay exact under NPT."""
        rc = self.plan.rc
        rc_out = rc + self.skin

        def step(carry, _):
            state, aux = carry[0].state, carry[1]
            c: DenseCarry = carry[0]
            maccs = carry[2] if measure is not None else None
            state, aux = ensemble.step1(state, aux, dt)
            smin = jnp.min(state.box.thickness() / c.ref_thick)
            ref_cart = state.box.cartesian(c.ref_frac)
            disp = state.box.minimum_image(state.position - ref_cart)
            thresh = jnp.maximum(0.5 * (smin * rc_out - rc), 0.0)
            need = (
                jnp.max(jnp.sum(disp * disp, axis=-1) * state.mask)
                > thresh * thresh
            )

            if self.engine == "compact":
                def rebin(args):
                    st, oid = args
                    sst, noid, ov = self._rebin_arrays(st, oid, st.box)
                    idx, ok = self._build_idx(sst)
                    ok = ok & self._cells_valid(st.box)
                    return (sst, noid, sst.box.fractional(sst.position),
                            sst.box.thickness(), ov | ~ok, idx)

                def keep(args):
                    st, oid = args
                    return (st, oid, c.ref_frac, c.ref_thick,
                            jnp.asarray(False), c.idx)

                state, orig_id, reff, reft, ov, idx = jax.lax.cond(
                    need, rebin, keep, (state, c.orig_id)
                )
                state = self.compute(state, idx)
            else:
                def rebin(args):
                    st, oid = args
                    sst, noid, ov = self._rebin_arrays(st, oid, st.box)
                    ov = ov | ~self._cells_valid(st.box)
                    return (sst, noid, sst.box.fractional(sst.position),
                            sst.box.thickness(), ov)

                def keep(args):
                    st, oid = args
                    return (st, oid, c.ref_frac, c.ref_thick,
                            jnp.asarray(False))

                state, orig_id, reff, reft, ov = jax.lax.cond(
                    need, rebin, keep, (state, c.orig_id)
                )
                idx = None
                state = self.compute(state)
            state, aux = ensemble.step2(state, aux, dt)
            new_c = DenseCarry(
                state=state, orig_id=orig_id, ref_frac=reff, ref_thick=reft,
                overflow=c.overflow | ov, idx=idx,
            )
            ys = observer(state) if observer is not None else None
            if measure is not None:
                maccs = measure(maccs, state, orig_id)
                return (new_c, aux, maccs), ys
            return (new_c, aux), ys

        return step

    def run(self, state: MDState, ensemble, dt, n_steps: int):
        """One-shot block; returns (carry, aux). jit externally for loops."""
        carry = self.init_carry(state)
        carry = carry._replace(state=self.compute(carry.state, carry.idx))
        aux = ensemble.init(carry.state)
        step = self.make_step(ensemble, dt)
        (carry, aux), _ = jax.lax.scan(step, (carry, aux), length=n_steps)
        return carry, aux

    def to_input_order(self, carry: DenseCarry, n: int) -> MDState:
        """Slot state -> input atom order (host-side helper for dumps)."""
        s = carry.state
        oid = np.asarray(carry.orig_id)
        valid = oid < n
        inv = np.zeros(n, np.int64)
        inv[oid[valid]] = np.nonzero(valid)[0]
        take = lambda a: jnp.asarray(np.asarray(a)[inv]) if a is not None else None
        return s._replace(
            position=take(s.position),
            velocity=take(s.velocity),
            force=take(s.force),
            mass=take(s.mass),
            type=take(s.type),
            potential_energy=take(s.potential_energy),
            virial=take(s.virial),
            heat_current=take(s.heat_current),
            mask=take(s.mask),
            unwrapped_position=take(s.unwrapped_position),
        )
