"""Compact-tile Tersoff-1989 engine: the classical-potential fast path.

Round 2 left Tersoff on the XLA list path (BASELINE config 2 ran at
6.4e5 atom-step/s); this reuses the compact NEP machinery
(engine/nep_compact.py: dense cell grid + distance-sorted window-relative
neighbor tiles gathered in-kernel) for the bond-order potential.

One kernel does everything (no ANN middle): per block it recomputes the
per-atom Tersoff energy from gathered displacement tiles and differentiates
it in-kernel (jax.value_and_grad), emitting

  * per-atom energy,
  * center-side position gradients (dE/dx_i through atom i's own terms),
  * per-pair neighbor cotangents p_ij = dE_i/dr12_ij, scattered onto window
    lanes by the shared MXU one-hot scatter kernel and folded back by XLA —
    exactly the reference's f12/f21 split (ref: src/force/tersoff1989.cu:
    337-520 two-pass bond-order kernels + find_properties_many_body),
  * per-atom Fan2015 virials W_i = sum_j r12 (x) p_ji via the scatter's
    9 extra channels (ref: src/force/potential.cu:73-113).

The zeta three-body sum is a loop over the MN neighbor slots: bond k's
direction enters as a (1, A) sublane slice broadcast against the whole
(MN, A) bond tile — O(MN^2) pair-pair work on ~100% live lanes, the same
economics that make the reference's two-pass kernels fast.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from gpumd_tpu.engine.grid import (
    DenseGridPlan,
    fold_block_windows,
    fold_ghost_grad_c,
    pack_block_windows,
    pack_ghost,
)
from gpumd_tpu.engine.nep_compact import (
    _EPS2,
    CompactPlan,
    _bgather_multi,
    _rep8,
    _sub_sum,
    _type_masks,
    block_centers,
    blocks_to_slots,
    build_indices,
    make_compact_plan,
    scatter_call,
)
from gpumd_tpu.model.box import Box
from gpumd_tpu.potentials.tersoff import Tersoff1989


class TersoffSpec(NamedTuple):
    """Tersoff-1989 constants, baked (hashable). Pair tables (T, T) and
    center tables (T,) flattened to tuples."""

    num_types: int
    a: Tuple[float, ...]
    b: Tuple[float, ...]
    lam: Tuple[float, ...]
    mu: Tuple[float, ...]
    r1: Tuple[float, ...]
    r2: Tuple[float, ...]
    beta: Tuple[float, ...]
    n: Tuple[float, ...]
    c2: Tuple[float, ...]
    d2: Tuple[float, ...]
    h: Tuple[float, ...]

    @staticmethod
    def from_potential(pot: Tersoff1989) -> "TersoffSpec":
        flat = lambda x: tuple(float(v) for v in np.asarray(x).ravel())
        return TersoffSpec(
            num_types=pot.num_types,
            a=flat(pot.a), b=flat(pot.b), lam=flat(pot.lam), mu=flat(pot.mu),
            r1=flat(pot.r1), r2=flat(pot.r2), beta=flat(pot.beta),
            n=flat(pot.n), c2=flat(pot.c2), d2=flat(pot.d2), h=flat(pot.h),
        )

    def pair_const(self, table, mi, mj):
        """Pair-table lookup as mask-product unroll (T <= 2)."""
        t = self.num_types
        acc = None
        for i in range(t):
            for j in range(t):
                term = mi[i] * mj[j] * table[i * t + j]
                acc = term if acc is None else acc + term
        return acc

    def center_const(self, table, mi):
        acc = None
        for i in range(self.num_types):
            term = mi[i] * table[i]
            acc = term if acc is None else acc + term
        return acc


def _tersoff_energy_tiles(dxv, dyv, dzv, tj, ct, spec: TersoffSpec,
                          mn: int):
    """Per-atom Tersoff energy (1, A) from displacement tiles (MN, A).

    Mirrors Tersoff1989._block_energy (list path, golden-tested) on the
    (neighbor-sublane, atom-lane) layout."""
    d2v = dxv * dxv + dyv * dyv + dzv * dzv
    ok = (d2v > _EPS2) & (tj > -0.5)
    inv_d = jax.lax.rsqrt(jnp.maximum(d2v, _EPS2))
    d = d2v * inv_d
    mi = _type_masks(ct, spec.num_types)  # (1, A) rows
    mj = _type_masks(tj, spec.num_types)  # (MN, A)

    r1p = spec.pair_const(spec.r1, mi, mj)
    r2p = spec.pair_const(spec.r2, mi, mj)
    x = jnp.clip((d - r1p) / jnp.maximum(r2p - r1p, 1e-30), 0.0, 1.0)
    fc = jnp.where(ok & (d < r2p), 0.5 * (1.0 + jnp.cos(jnp.pi * x)), 0.0)
    dsafe = jnp.minimum(d, r2p)
    fr = spec.pair_const(spec.a, mi, mj) * jnp.exp(
        -spec.pair_const(spec.lam, mi, mj) * dsafe
    )
    fa = spec.pair_const(spec.b, mi, mj) * jnp.exp(
        -spec.pair_const(spec.mu, mi, mj) * dsafe
    )

    ux, uy, uz = dxv * inv_d, dyv * inv_d, dzv * inv_d
    # parked center lanes (type code -1) zero every type mask, which would
    # make c2/d2c = 0/0 and poison the summed loss gradient with NaNs —
    # substitute safe constants and mask the energy instead.
    real_c = jnp.where(ct > -0.5, 1.0, 0.0)
    c2 = spec.center_const(spec.c2, mi)
    d2c = spec.center_const(spec.d2, mi) + (1.0 - real_c)
    hh = spec.center_const(spec.h, mi)
    sub = jax.lax.broadcasted_iota(jnp.int32, (mn, 1), 0)
    zeta = None
    for k in range(mn):
        uxk = ux[k:k + 1, :]
        uyk = uy[k:k + 1, :]
        uzk = uz[k:k + 1, :]
        fck = fc[k:k + 1, :]
        cosjk = ux * uxk + uy * uyk + uz * uzk
        g = (1.0 + c2 / d2c) - c2 / (d2c + (cosjk - hh) ** 2)
        not_self = jnp.where(sub == k, 0.0, 1.0)
        term = fck * g * not_self
        zeta = term if zeta is None else zeta + term

    beta = spec.center_const(spec.beta, mi)
    nn = spec.center_const(spec.n, mi) + (1.0 - real_c)
    zeta_ok = zeta > 1e-16
    bzn = jnp.where(zeta_ok, (beta * jnp.where(zeta_ok, zeta, 1.0)) ** nn,
                    0.0)
    bij = (1.0 + bzn) ** (-0.5 / nn)
    e = 0.5 * fc * (fr - bij * fa) * real_c
    return _sub_sum(e)  # (1, A)


def _tersoff_kernel(cplan: CompactPlan, spec: TersoffSpec, interpret: bool,
                    per_atom_virial: bool,
                    c_ref, w_ref, i_ref, out_ref, p_ref):
    a_pad = cplan.a_pad
    nblk = cplan.nblk
    mn = cplan.mn_r
    cx = c_ref[0, 0, 0, 0:1, :]
    cy = c_ref[0, 0, 0, 1:2, :]
    cz = c_ref[0, 0, 0, 2:3, :]
    ct = c_ref[0, 0, 0, 3:4, :]
    dt = cx.dtype
    srcs = [_rep8(w_ref[0, 0, 0, c:c + 1, :], interpret) for c in range(4)]

    # gather the full (MN, A) displacement tiles
    gx, gy, gz, gt = [], [], [], []
    for r in range(mn // 8):
        idx8 = i_ref[0, 0, 0, r * 8:(r + 1) * 8, :]
        xj, yj, zj, tj8 = _bgather_multi(srcs, idx8, nblk)
        gx.append(xj - cx)
        gy.append(yj - cy)
        gz.append(zj - cz)
        gt.append(tj8)
    dxv = jnp.concatenate(gx, axis=0)
    dyv = jnp.concatenate(gy, axis=0)
    dzv = jnp.concatenate(gz, axis=0)
    tj = jnp.concatenate(gt, axis=0)

    def loss(dx_, dy_, dz_):
        e = _tersoff_energy_tiles(dx_, dy_, dz_, tj, ct, spec, mn)
        return jnp.sum(e), e

    (tot, e_row), (pgx, pgy, pgz) = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True
    )(dxv, dyv, dzv)

    # center grads: dE/dx_i = -sum_m p_ij
    out_ref[0, 0, 0, 0:1, :] = -_sub_sum(pgx)
    out_ref[0, 0, 0, 1:2, :] = -_sub_sum(pgy)
    out_ref[0, 0, 0, 2:3, :] = -_sub_sum(pgz)
    rr = (dxv, dyv, dzv)
    pp = (pgx, pgy, pgz)
    ch = 3
    for av in range(3):
        for bv in range(3):
            if per_atom_virial:
                out_ref[0, 0, 0, ch:ch + 1, :] = jnp.zeros((1, a_pad), dt)
            else:
                out_ref[0, 0, 0, ch:ch + 1, :] = _sub_sum(-rr[av] * pp[bv])
            ch += 1
    out_ref[0, 0, 0, 12:13, :] = e_row
    for c in range(13, 16):
        out_ref[0, 0, 0, c:c + 1, :] = jnp.zeros((1, a_pad), dt)

    for k in range(3):
        p_ref[0, 0, 0, k] = pp[k]
    if per_atom_virial:
        chv = 3
        for av in range(3):
            for bv in range(3):
                p_ref[0, 0, 0, chv] = -rr[av] * pp[bv]
                chv += 1
    p_used = 12 if per_atom_virial else 3
    for c in range(p_used, p_ref.shape[3]):
        p_ref[0, 0, 0, c] = jnp.zeros((mn, a_pad), dt)


def tersoff_kernel_call(centers, cand, idx, cplan: CompactPlan,
                        spec: TersoffSpec, per_atom_virial: bool,
                        interpret: bool):
    nz, ny = cplan.base.grid[2], cplan.base.grid[1]
    nxb, a_pad, wl = cplan.nxb, cplan.a_pad, cplan.wl
    mn = cplan.mn_r
    pch = 12 if per_atom_virial else 4
    return pl.pallas_call(
        functools.partial(_tersoff_kernel, cplan, spec, interpret,
                          per_atom_virial),
        grid=(nz, ny, nxb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 4, a_pad), lambda z, y, x: (z, y, x, 0, 0)),
            pl.BlockSpec((1, 1, 1, 4, wl), lambda z, y, x: (z, y, x, 0, 0)),
            pl.BlockSpec((1, 1, 1, mn, a_pad),
                         lambda z, y, x: (z, y, x, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, 16, a_pad),
                         lambda z, y, x: (z, y, x, 0, 0)),
            pl.BlockSpec((1, 1, 1, pch, mn, a_pad),
                         lambda z, y, x: (z, y, x, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, nxb, 16, a_pad), centers.dtype),
            jax.ShapeDtypeStruct((nz, ny, nxb, pch, mn, a_pad),
                                 centers.dtype),
        ],
        interpret=interpret,
    )(centers, cand, idx)


class CompactTersoffOutput(NamedTuple):
    energy: jnp.ndarray
    force: jnp.ndarray
    virial_total: jnp.ndarray
    virial_atom: Optional[jnp.ndarray]


def compact_tersoff_compute(
    position_slots,
    type_slots,
    slot_mask,
    box: Box,
    cplan: CompactPlan,
    idx,
    spec: TersoffSpec,
    per_atom_virial: bool = False,
    interpret: Optional[bool] = None,
) -> CompactTersoffOutput:
    with jax.default_matmul_precision("high"):
        return _compact_tersoff_compute(
            position_slots, type_slots, slot_mask, box, cplan, idx, spec,
            per_atom_virial, interpret)


def _compact_tersoff_compute(
    position_slots,
    type_slots,
    slot_mask,
    box: Box,
    cplan: CompactPlan,
    idx,
    spec: TersoffSpec,
    per_atom_virial: bool = False,
    interpret: Optional[bool] = None,
) -> CompactTersoffOutput:
    """Force-path matmul policy: everything XLA-side runs bf16_3x ("high");
    the scatter kernel's in-Mosaic dot is DEFAULT with a manual hi/lo split
    (see engine/nep_compact.py _scatter_kernel).  Enforced by
    tests/test_precision_policy.py."""
    plan = cplan.base
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    garr = pack_ghost(position_slots, type_slots, slot_mask, box, plan)
    centers = block_centers(garr, cplan)
    cand = pack_block_windows(garr, plan, cplan.bx, cplan.wl)
    outf, pvals = tersoff_kernel_call(centers, cand, idx, cplan, spec,
                                      per_atom_virial, interpret)
    dcand = scatter_call(pvals, idx, cplan, interpret)
    dghost = fold_block_windows(dcand, plan, cplan.bx)
    dslots = fold_ghost_grad_c(dghost, plan)

    og = blocks_to_slots(outf, cplan)
    grad_total = og[:, :3] + dslots[:, :3]
    force = -grad_total * slot_mask[:, None]
    e_atom = og[:, 12] * slot_mask
    if per_atom_virial:
        w_atom = dslots[:, 3:12].reshape(-1, 3, 3) * slot_mask[:, None, None]
        w_total = jnp.sum(w_atom, axis=0)
    else:
        w_atom = None
        w_total = jnp.einsum(
            "nab,n->ab", og[:, 3:12].reshape(-1, 3, 3), slot_mask
        )
    return CompactTersoffOutput(
        energy=e_atom, force=force, virial_total=w_total, virial_atom=w_atom
    )


class CompactTersoffMD:
    """Tersoff MD driver on the compact engine (mirrors DenseNEPMD)."""

    def __init__(
        self,
        pot: Tersoff1989,
        box: Box,
        n_atoms: int,
        position: Optional[np.ndarray] = None,
        skin: float = 1.0,
        cap: Optional[int] = None,
        interpret: Optional[bool] = None,
        per_atom_virial: bool = False,
        mn: Optional[int] = None,
        zero_net_force: bool = True,
    ):
        from gpumd_tpu.engine.grid import plan_grid
        from gpumd_tpu.engine.nep_compact import plan_grid_compact

        self.spec = TersoffSpec.from_potential(pot)
        self.rc = pot.rc
        if cap is None:
            self.plan = plan_grid_compact(box, pot.rc, skin, n_atoms,
                                          position=position)
        else:
            self.plan = plan_grid(box, pot.rc, skin, n_atoms,
                                  position=position, cap=cap)
        if self.plan is None:
            raise ValueError("box too thin for the compact tersoff engine")
        self.skin = skin
        self.interpret = interpret
        self.per_atom_virial = per_atom_virial
        self.zero_net_force = zero_net_force
        # Tersoff's per-pair cost scales as MN^2 (the zeta loop), so cap
        # slack matters much more than for NEP: lighter margins and 8-slot
        # granularity (the kernel chunks by 8, not 32).  Si at skin 1.0
        # lands at mn 24 instead of 32 — a 1.8x cut of the dominant loop.
        self.cplan = make_compact_plan(
            self.plan, position=position, box=box, rc_angular=pot.rc,
            mn_r=mn, mn_a=mn, slack_mul=1.2, slack_add=4, rnd=8,
        )
        # single list: angular cap == radial cap
        self.cplan = self.cplan._replace(mn_a=self.cplan.mn_r)
        # route through DenseNEPMD's compact carry/step machinery
        self.engine = "compact"
        self.hnemd_fe = None  # set by the app for HNEMD runs

    def _build_idx(self, sstate):
        garr = pack_ghost(sstate.position, sstate.type, sstate.mask,
                          sstate.box, self.plan)
        centers = block_centers(garr, self.cplan)
        cand = pack_block_windows(garr, self.plan, self.cplan.bx,
                                  self.cplan.wl)
        return build_indices(centers, cand, self.cplan, self.rc)

    def compute(self, state, idx=None):
        out = compact_tersoff_compute(
            state.position, state.type, state.mask, state.box,
            self.cplan, idx, self.spec,
            per_atom_virial=self.per_atom_virial, interpret=self.interpret,
        )
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
        if out.virial_atom is not None:
            w = out.virial_atom
        else:
            w = (out.virial_total / n_real) * state.mask[:, None, None]
        # exact global Newton-III: see DenseNEPMD (zero_net_force); turn
        # off for exact compact-vs-list force-parity comparisons
        f = out.force
        if self.zero_net_force and self.hnemd_fe is None:
            f = (f - jnp.sum(f, axis=0) / n_real) * state.mask[:, None]
        if self.hnemd_fe is not None:
            # homogeneous driving force F_i += W_i^T Fe with net-force
            # correction (ref: src/force/force.cu:567-608); requires
            # per_atom_virial=True (the app enforces this) — round-5:
            # BASELINE config 4 (graphene Tersoff HNEMD) runs here
            fe = jnp.asarray(self.hnemd_fe, dtype=f.dtype)
            f = f + jnp.einsum("nba,b->na", w, fe) * state.mask[:, None]
            f = (f - jnp.sum(f, axis=0) / n_real) * state.mask[:, None]
        # per-atom heat current J_i = W_i v_i (Fan2015; feeds HNEMD/SHC)
        j = jnp.sum(w * state.velocity[:, None, :], axis=2)
        return state._replace(
            force=f, potential_energy=out.energy, virial=w,
            heat_current=j,
        )

    # reuse the generic carry/step machinery from DenseNEPMD
    def init_carry(self, state):
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        return DenseNEPMD.init_carry(self, state)

    def _measure_bands(self, neigh):
        # Tersoff plans never enable compact candidate lists (cl == 0), so
        # banded gathers don't apply; DenseNEPMD.init_carry calls this hook
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        DenseNEPMD._measure_bands(self, neigh)

    def _rebin_arrays(self, state, orig_id, box):
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        return DenseNEPMD._rebin_arrays(self, state, orig_id, box)

    def _cells_valid(self, box):
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        return DenseNEPMD._cells_valid(self, box)

    def make_step(self, ensemble, dt, observer=None, measure=None):
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        return DenseNEPMD.make_step(self, ensemble, dt, observer=observer,
                                    measure=measure)

    def run(self, state, ensemble, dt, n_steps: int):
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        return DenseNEPMD.run(self, state, ensemble, dt, n_steps)

    def to_input_order(self, carry, n: int):
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        return DenseNEPMD.to_input_order(self, carry, n)
