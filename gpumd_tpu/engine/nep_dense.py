"""Fused dense-grid NEP evaluation: the TPU hot path.

Replaces the (N, MN) neighbor-list pipeline for large-box NEP MD.  The
reference evaluates NEP with one CUDA thread per atom walking a compacted
neighbor list (ref: src/force/nep.cu:488-861); on TPU the equivalent random
gathers run ~1000x below the VPU roofline, so this engine reorganizes the
whole evaluation around the dense cell grid of engine/grid.py:

  K1 (Pallas): for every cell, pair math against the 27-cell window —
     distances, cutoff, Chebyshev bases, real spherical harmonics — and
     accumulation of per-atom *type-resolved basis sums*
        S[t, k]      = sum_{j: type_j = t} f_k(r_ij)                (radial)
        A[t, k, lm]  = sum_{j: type_j = t} f_k(r_ij) Y_lm(r_ij)     (angular)
     plus the ZBL pair energy.  All memory access is static window slices;
     the per-(t,k)-channel x Y_lm contraction is one batched MXU matmul.

  middle (XLA): per-atom contraction with the type-pair c tensors
     (q_n = c[t_i, t, n, k] S[t, k], s_nlm likewise), rotation invariants,
     and the per-element ANN — reusing the exact functions the list path
     uses (potentials/nep/model.py), so both paths share golden coverage.

  K2 (Pallas): the custom vjp of K1.  Recomputes the pair tiles and applies
     jax.vjp *inside the kernel*, emitting position cotangents into
     per-(window-row, component) accumulation buffers that XLA folds with 9
     shifted adds — forces with zero scatters and zero reverse-pair gathers
     (the list path's two big gathers are gone entirely).

Total virial is exact via the ghost-coordinate identity
W = -sum_g x_g (x) dE/dx_g (ghost coordinates include their lattice shift).
Per-atom virials (heat-current observables) are not produced by this engine
yet — use the list path for those runs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpumd_tpu.engine.grid import DenseGridPlan, FAR, fold_ghost_grad, pack_ghost
from gpumd_tpu.model.box import Box
from gpumd_tpu.potentials.nep import tables
from gpumd_tpu.potentials.nep.model import _ZBL_UNIVERSAL, _angular_q, ann_energy
from gpumd_tpu.potentials.nep.params import NepModel, NepParams
from gpumd_tpu.units import K_C

_EPS2 = 1.0e-6  # d^2 below this = self/parked-slot pair -> masked


class DenseNepSpec(NamedTuple):
    """Static tile-math constants extracted from a NepModel (hashable)."""

    num_types: int
    kr1: int  # basis_size_radial + 1
    ka1: int  # basis_size_angular + 1
    l_max: int
    rc_radial: Tuple[float, ...]
    rc_angular: Tuple[float, ...]
    zbl: bool
    zbl_rc_inner: float
    zbl_rc_outer: float
    atomic_numbers: Tuple[int, ...]

    @property
    def nlm(self) -> int:
        return self.l_max * (self.l_max + 2)

    @property
    def ch_r(self) -> int:
        return self.num_types * self.kr1

    @property
    def ch_a(self) -> int:
        return self.num_types * self.ka1

    @property
    def s_width(self) -> int:
        return self.ch_r + 1  # + ZBL energy channel

    @property
    def a_width(self) -> int:
        return self.ch_a * self.nlm

    @staticmethod
    def from_model(model: NepModel) -> "DenseNepSpec":
        if model.model_type != 0:
            raise NotImplementedError("dense engine: potential models only")
        if model.num_types > 4:
            raise NotImplementedError("dense engine: <= 4 species (use list path)")
        if model.zbl and (model.zbl_flexible or model.zbl_typewise_factor):
            raise NotImplementedError("dense engine: universal ZBL only")
        return DenseNepSpec(
            num_types=model.num_types,
            kr1=model.basis_size_radial + 1,
            ka1=model.basis_size_angular + 1,
            l_max=model.l_max,
            rc_radial=tuple(model.rc_radial),
            rc_angular=tuple(model.rc_angular),
            zbl=bool(model.zbl),
            zbl_rc_inner=float(model.zbl_rc_inner),
            zbl_rc_outer=float(model.zbl_rc_outer),
            atomic_numbers=tuple(model.atomic_numbers),
        )


# --------------------------------------------------------------------------
# tile math (pure jnp: shared by the Pallas kernels and interpret mode)
# --------------------------------------------------------------------------


def _by_type(tcode, values):
    """Select values[t] where round(tcode) == t; tcode is a float type code
    (types ride the packed position array).  Unrolled over the (static,
    small) type count — no gathers."""
    out = values[0] * jnp.ones_like(tcode)
    for t in range(1, len(values)):
        out = jnp.where(jnp.abs(tcode - t) < 0.5, values[t], out)
    return out


def _chebyshev_tile(d, rcp, fc, k_max: int):
    """f_0 = fc; f_k = (T_k(x)+1)/2 * fc (ref: find_fn) on a pair tile."""
    x = jnp.clip(2.0 * (d / rcp - 1.0) ** 2 - 1.0, -1.0, 1.0)
    fs = [fc]
    if k_max >= 1:
        t_prev, t_cur = jnp.ones_like(x), x
        fs.append(0.5 * (t_cur + 1.0) * fc)
        for _ in range(2, k_max + 1):
            t_prev, t_cur = t_cur, 2.0 * x * t_cur - t_prev
            fs.append(0.5 * (t_cur + 1.0) * fc)
    return fs


def _ylm_tile(ux, uy, uz, l_max: int, dtype):
    """Real spherical-harmonic components on a pair tile, in the reference's
    s ordering: per L = 1..l_max -> [m=0, m=1 re, m=1 im, ...]
    (ref: accumulate_s, nep_utilities.cuh; matches _angular_components)."""
    zp = [jnp.ones_like(uz)]
    for _ in range(l_max):
        zp.append(zp[-1] * uz)
    cr = [jnp.ones_like(ux)]
    ci = [jnp.zeros_like(ux)]
    for _ in range(l_max):
        cr_new = cr[-1] * ux - ci[-1] * uy
        ci_new = cr[-1] * uy + ci[-1] * ux
        cr.append(cr_new)
        ci.append(ci_new)
    comps = []
    for L in range(1, l_max + 1):
        ztab = np.asarray(tables.z_coefficient_table(L))
        for m in range(L + 1):
            q_lm = None
            for k in range(L + 1):
                c = float(ztab[m, k])
                if c == 0.0:
                    continue
                term = zp[k] * c
                q_lm = term if q_lm is None else q_lm + term
            if q_lm is None:
                q_lm = jnp.zeros_like(uz)
            if m == 0:
                comps.append(q_lm)
            else:
                comps.append(q_lm * cr[m])
                comps.append(q_lm * ci[m])
    return comps  # list of NLM tiles


def _tile_chunk(cx, cy, cz, wx, wy, wz, ct, wt, spec: DenseNepSpec):
    """Pair math of one center cell (cap atoms) against one candidate chunk.

    Args:
      cx, cy, cz: (cap, 1) center coordinates; ct (cap, 1) float type codes.
      wx, wy, wz, wt: (1, L) candidate row.
    Returns:
      s_out: (cap, ch_r + 1) radial type-resolved basis sums + ZBL energy.
      a_out: (cap, ch_a, NLM) angular basis x Y_lm sums.
    """
    dtype = cx.dtype
    t = spec.num_types
    dx = wx - cx
    dy = wy - cy
    dz = wz - cz
    d2 = dx * dx + dy * dy + dz * dz
    pair_ok = d2 > _EPS2
    inv_d = jax.lax.rsqrt(jnp.maximum(d2, _EPS2))
    d = d2 * inv_d

    rc_r = [jnp.asarray(v, dtype) for v in spec.rc_radial]
    rc_a = [jnp.asarray(v, dtype) for v in spec.rc_angular]
    rcp_r = 0.5 * (_by_type(ct, rc_r) + _by_type(wt, rc_r))
    rcp_a = 0.5 * (_by_type(ct, rc_a) + _by_type(wt, rc_a))

    # neighbor type one-hots (parked slots have wt = -1 -> all zeros)
    m_t = [jnp.where(jnp.abs(wt - tt) < 0.5, 1.0, 0.0).astype(dtype)
           for tt in range(t)]

    # radial channels
    xr = d / rcp_r
    fc_r = jnp.where(pair_ok & (xr < 1.0),
                     0.5 * jnp.cos(jnp.pi * xr) + 0.5, 0.0)
    fn_r = _chebyshev_tile(d, rcp_r, fc_r, spec.kr1 - 1)
    s_cols = []
    for tt in range(t):
        for k in range(spec.kr1):
            s_cols.append(jnp.sum(fn_r[k] * m_t[tt], axis=1))  # (cap,)

    # ZBL pair energy channel
    if spec.zbl:
        zn = [jnp.asarray(float(z), dtype) for z in spec.atomic_numbers]
        zi = _by_type(ct, zn)
        zj = _by_type(wt, zn)
        a_inv = (zi**0.23 + zj**0.23) * 2.134563
        x = d * a_inv
        zp = _ZBL_UNIVERSAL
        phi = (
            zp[0] * jnp.exp(-zp[1] * x)
            + zp[2] * jnp.exp(-zp[3] * x)
            + zp[4] * jnp.exp(-zp[5] * x)
            + zp[6] * jnp.exp(-zp[7] * x)
        )
        rc1, rc2 = spec.zbl_rc_inner, spec.zbl_rc_outer
        frac = (d - rc1) / max(rc2 - rc1, 1e-30)
        sw = jnp.where(
            d < rc1, 1.0,
            jnp.where(d < rc2, 0.5 * jnp.cos(jnp.pi * frac) + 0.5, 0.0),
        )
        sw = jnp.where(pair_ok, sw, 0.0)
        ez = 0.5 * K_C * zi * zj * inv_d * phi * sw
        # neighbor one-hots are zero on parked slots; real neighbors of any
        # type contribute, so gate on the sum of one-hots.
        real = sum(m_t)
        s_cols.append(jnp.sum(ez * real, axis=1))
    else:
        s_cols.append(jnp.zeros_like(s_cols[0]))
    s_out = jnp.stack(s_cols, axis=1)  # (cap, ch_r + 1)

    # angular channels
    xa = d / rcp_a
    fc_a = jnp.where(pair_ok & (xa < 1.0),
                     0.5 * jnp.cos(jnp.pi * xa) + 0.5, 0.0)
    fn_a = _chebyshev_tile(d, rcp_a, fc_a, spec.ka1 - 1)
    ux, uy, uz = dx * inv_d, dy * inv_d, dz * inv_d
    ylm = _ylm_tile(ux, uy, uz, spec.l_max, dtype)

    f_ang = jnp.stack(
        [fn_a[k] * m_t[tt] for tt in range(t) for k in range(spec.ka1)],
        axis=1,
    )  # (cap, ch_a, L)
    y_stack = jnp.stack(ylm, axis=1)  # (cap, NLM, L)
    a_out = jax.lax.dot_general(
        f_ang,
        y_stack,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=dtype,
        # in-kernel: explicit HIGHEST (full f32) — the surrounding
        # default_matmul_precision("high") context would leak HIGH here,
        # which Mosaic's dot lowering rejects; and DEFAULT bf16 on the
        # angular descriptor assembly breaks the NVE drift gate
        precision=jax.lax.Precision.HIGHEST,
    )  # (cap, ch_a, NLM)
    return s_out, a_out


# --------------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------------


def _window_specs(plan: DenseGridPlan):
    """Nine (dz, dy) ghost-row input specs of the packed ghost array."""
    wxg = plan.ghost_row_lanes
    specs = []
    for dz in range(3):
        for dy in range(3):
            specs.append(
                pl.BlockSpec(
                    (1, 1, 4, wxg),
                    lambda z, y, dz=dz, dy=dy: (z + dz, y + dy, 0, 0),
                )
            )
    return specs


def _row_views(wrefs, cap, cx):
    """Center (4, cap) view + the nine (4, 3cap) candidate rows at cell cx.

    Chunking the candidate axis per (dz, dy) row keeps every tile at 3cap
    lanes (~128 after padding), bounding kernel VMEM well under the 16 MB
    budget at any grid size."""
    sl_c = slice((cx + 1) * cap, (cx + 2) * cap)
    sl_w = slice(cx * cap, (cx + 3) * cap)
    center = wrefs[4][0, 0, :, sl_c]  # (4, cap): dz=1, dy=1 row
    cands = [wrefs[r][0, 0, :, sl_w] for r in range(9)]
    return center, cands


def _k1_kernel(plan: DenseGridPlan, spec: DenseNepSpec, *refs):
    wrefs = refs[:9]
    s_ref, a_ref = refs[9], refs[10]
    cap = plan.cap
    nx = plan.grid[0]
    for cx in range(nx):
        center, cands = _row_views(wrefs, cap, cx)
        cxs = [center[k : k + 1, :].reshape(cap, 1) for k in range(4)]
        s_acc = None
        a_acc = None
        for chunk in cands:  # nine (4, 3cap) candidate rows
            ws = [chunk[k : k + 1, :] for k in range(4)]
            s, a = _tile_chunk(
                cxs[0], cxs[1], cxs[2], ws[0], ws[1], ws[2], cxs[3], ws[3],
                spec,
            )
            s_acc = s if s_acc is None else s_acc + s
            a_acc = a if a_acc is None else a_acc + a
        sl = slice(cx * cap, (cx + 1) * cap)
        s_ref[0, 0, sl, :] = s_acc
        # per-channel stores: Mosaic cannot reshape (cap, ch, nlm) ->
        # (cap, ch*nlm), but static lane-sliced 2D stores are free
        for ch in range(spec.ch_a):
            a_ref[0, 0, sl, ch * spec.nlm : (ch + 1) * spec.nlm] = a_acc[
                :, ch, :
            ]


def _k2_kernel(plan: DenseGridPlan, spec: DenseNepSpec, *refs):
    """Backward: per (z, y, cx) write a (27, 3cap) cotangent tile — rows are
    (dz, dy, component), lanes the 3-cell x window.  Pure stores (Mosaic has
    no scatter-add); the overlapping-window summation happens in XLA with 81
    static slice-adds (see dense_nep_compute)."""
    wrefs = refs[:9]
    cs_ref, ca_ref = refs[9], refs[10]
    g_ref = refs[11]
    cap = plan.cap
    nx = plan.grid[0]
    for cx in range(nx):
        center, cands = _row_views(wrefs, cap, cx)
        cxs = [center[k : k + 1, :].reshape(cap, 1) for k in range(4)]
        sl = slice(cx * cap, (cx + 1) * cap)
        cot_s = cs_ref[0, 0, sl, :]
        cot_a = jnp.stack(
            [
                ca_ref[0, 0, sl, ch * spec.nlm : (ch + 1) * spec.nlm]
                for ch in range(spec.ch_a)
            ],
            axis=1,
        )  # (cap, ch_a, nlm)
        rows = [None] * 27
        cgrads = [None, None, None]  # center grads, summed over chunks
        for r in range(9):
            chunk = cands[r]
            ws = [chunk[k : k + 1, :] for k in range(4)]

            def chunk_fn(cx_, cy_, cz_, wx_, wy_, wz_):
                return _tile_chunk(
                    cx_, cy_, cz_, wx_, wy_, wz_, cxs[3], ws[3], spec
                )

            _, vjp = jax.vjp(chunk_fn, cxs[0], cxs[1], cxs[2],
                             ws[0], ws[1], ws[2])
            grads = vjp((cot_s, cot_a))
            for k in range(3):
                cgrads[k] = (
                    grads[k] if cgrads[k] is None else cgrads[k] + grads[k]
                )
                rows[r * 3 + k] = grads[3 + k][0]  # (3cap,)
        # center cotangents belong to the (dz=1, dy=1) row, middle cell
        zpad = jnp.zeros((cap,), cot_s.dtype)
        for k in range(3):
            row = (1 * 3 + 1) * 3 + k
            rows[row] = rows[row] + jnp.concatenate(
                [zpad, cgrads[k][:, 0], zpad]
            )
        g_ref[0, 0, cx, :, :] = jnp.stack(rows, axis=0)


def k1_call(garr, plan: DenseGridPlan, spec: DenseNepSpec, interpret: bool):
    nx, ny, nz = plan.grid
    nxc = plan.row_lanes
    dtype = garr.dtype
    return pl.pallas_call(
        functools.partial(_k1_kernel, plan, spec),
        grid=(nz, ny),
        in_specs=_window_specs(plan),
        out_specs=[
            pl.BlockSpec((1, 1, nxc, spec.s_width), lambda z, y: (z, y, 0, 0)),
            pl.BlockSpec((1, 1, nxc, spec.a_width), lambda z, y: (z, y, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, nxc, spec.s_width), dtype),
            jax.ShapeDtypeStruct((nz, ny, nxc, spec.a_width), dtype),
        ],
        interpret=interpret,
    )(*([garr] * 9))


def k2_call(garr, cot_s, cot_a, plan: DenseGridPlan, spec: DenseNepSpec,
            interpret: bool):
    nx, ny, nz = plan.grid
    nxc = plan.row_lanes
    cap3 = 3 * plan.cap
    dtype = garr.dtype
    return pl.pallas_call(
        functools.partial(_k2_kernel, plan, spec),
        grid=(nz, ny),
        in_specs=_window_specs(plan)
        + [
            pl.BlockSpec((1, 1, nxc, spec.s_width), lambda z, y: (z, y, 0, 0)),
            pl.BlockSpec((1, 1, nxc, spec.a_width), lambda z, y: (z, y, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, nx, 27, cap3), lambda z, y: (z, y, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx, 27, cap3), dtype),
        interpret=interpret,
    )(*([garr] * 9), cot_s, cot_a)


# --------------------------------------------------------------------------
# middle (per-atom XLA) + full evaluation
# --------------------------------------------------------------------------


def middle_energy(s_cat, a_cat, ti, model: NepModel, params: NepParams):
    """Per-slot energies from the kernel's basis sums: c-tensor contraction,
    rotation invariants, ANN, ZBL (ref: find_descriptor nep.cu:488-659)."""
    dtype = s_cat.dtype
    t = model.num_types
    kr1 = model.basis_size_radial + 1
    ka1 = model.basis_size_angular + 1
    nlm = model.l_max * (model.l_max + 2)
    ns = s_cat.shape[0]
    s_rad = s_cat[:, : t * kr1].reshape(ns, t, kr1)
    e_zbl = s_cat[:, t * kr1]
    a = a_cat.reshape(ns, t, ka1, nlm)

    c_r = params.c_radial.astype(dtype)  # (T, T, NR1, KR1)
    c_a = params.c_angular.astype(dtype)  # (T, T, NA1, KA1)
    q_rad = 0.0
    s_ang = 0.0
    for a_t in range(t):
        own = (ti == a_t)[:, None]
        q_rad = q_rad + jnp.where(
            own,
            jnp.einsum("ptk,tnk->pn", s_rad, c_r[a_t],
                       preferred_element_type=dtype),
            0.0,
        )
        s_ang = s_ang + jnp.where(
            own[..., None],
            jnp.einsum("ptkl,tnk->pnl", a, c_a[a_t],
                       preferred_element_type=dtype),
            0.0,
        )
    q_ang = _angular_q(s_ang, model, dtype)  # (Ns, num_l, NA1)
    q = jnp.concatenate([q_rad, q_ang.reshape(ns, -1)], axis=-1)
    q = q * params.q_scaler.astype(dtype)
    return ann_energy(q, ti, params, dtype) + e_zbl


class DenseNepOutput(NamedTuple):
    energy: jnp.ndarray  # (n_slots,)
    force: jnp.ndarray  # (n_slots, 3)
    virial_total: jnp.ndarray  # (3, 3), reference sign convention


def dense_nep_compute(
    position_slots,
    type_slots,
    slot_mask,
    box: Box,
    plan: DenseGridPlan,
    model: NepModel,
    params: NepParams,
    interpret: Optional[bool] = None,
) -> DenseNepOutput:
    """Full fused NEP evaluation on dense slot state.

    Contract: `position_slots` must hold the box-wrapped representative of
    each atom, consistent with its cell assignment at the last rebin (atoms
    may since have drifted up to skin/2 outside their cell — the stencil
    still covers them, exactly the Verlet-list criterion)."""
    spec = DenseNepSpec.from_model(model)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    garr = pack_ghost(position_slots, type_slots, slot_mask, box, plan)
    s_cat, a_cat = k1_call(garr, plan, spec, interpret)
    ns = plan.n_slots
    s_flat = s_cat.reshape(ns, spec.s_width)
    a_flat = a_cat.reshape(ns, spec.a_width)

    def mid(s, a):
        e = middle_energy(s, a, type_slots, model, params)
        return e * slot_mask

    e_atom, vjp_mid = jax.vjp(mid, s_flat, a_flat)
    cot_s, cot_a = vjp_mid(jnp.ones_like(e_atom))

    nz, ny, nx = plan.grid[2], plan.grid[1], plan.grid[0]
    g = k2_call(
        garr,
        cot_s.reshape(nz, ny, plan.row_lanes, spec.s_width),
        cot_a.reshape(nz, ny, plan.row_lanes, spec.a_width),
        plan,
        spec,
        interpret,
    )
    # fold the per-cell cotangent tiles back onto the ghost grid: 81 static
    # slice-adds resolve the overlapping 3-cell windows (regular, no scatter)
    cap = plan.cap
    wxg = plan.ghost_row_lanes
    dg = jnp.zeros((nz + 2, ny + 2, 3, wxg), garr.dtype)
    for dz in range(3):
        for dy in range(3):
            for k in range(3):
                row = (dz * 3 + dy) * 3 + k
                for dx in range(3):
                    seg = g[:, :, :, row, dx * cap : (dx + 1) * cap]
                    dg = dg.at[
                        dz : dz + nz,
                        dy : dy + ny,
                        k,
                        dx * cap : dx * cap + nx * cap,
                    ].add(seg.reshape(nz, ny, nx * cap))
    # total virial: W_ab = - sum_g x_g,a dE/dx_g,b (ghost coords carry shifts)
    w_total = -jnp.einsum("zyax,zybx->ab", garr[:, :, :3], dg)
    force = -fold_ghost_grad(dg, plan) * slot_mask[:, None]
    return DenseNepOutput(energy=e_atom, force=force, virial_total=w_total)


# --------------------------------------------------------------------------
# v2 kernels: per-cell packed candidates (lane-aligned, grid-parallel)
#
# The v1 kernels walked the x row inside the kernel and sliced a (4, 3cap)
# window at cap-grain lane offsets; Mosaic compile time explodes on such
# misaligned lane slices (measured: cap=32 ~10 s, cap=48 ~24 s, cap=88
# ~120 s PER ROW, x row count multiplies).  v2 moves the cell index into
# the pallas grid and feeds each cell ONE lane-aligned candidate block
# prepacked by XLA (grid.pack_candidates) — kernel compile cost is O(1) in
# the grid and all lane accesses are 128-aligned.
# --------------------------------------------------------------------------

def _chunk_lanes(cap: int) -> int:
    """Candidate-chunk width: bound cap*chunk so the K2 vjp's live tiles
    fit VMEM (measured: cap=88 x 512 lanes -> 22 MB, over the 16 MB scope).
    """
    return int(np.clip((16384 // cap) // 128 * 128, 128, 512))


def _k1b_kernel(plan: DenseGridPlan, spec: DenseNepSpec, by: int, *refs):
    """One (cell-block, candidate-chunk) grid step; the chunk axis is the
    INNERMOST grid dimension so the s/a output blocks stay resident in
    VMEM and accumulate across chunks (canonical Pallas reduction).
    `by` y-cells are processed per grid step (leading-axis slices, all
    lane-aligned) to amortize per-step grid overhead."""
    c_ref, w_ref, s_ref, a_ref = refs
    cap = plan.cap
    first = pl.program_id(3) == 0
    for b in range(by):
        center = c_ref[0, b, 0]  # (4, cap)
        cxs = [center[k : k + 1, :].reshape(cap, 1) for k in range(4)]
        ws = [w_ref[0, b, 0, k : k + 1, :] for k in range(4)]
        s, a = _tile_chunk(
            cxs[0], cxs[1], cxs[2], ws[0], ws[1], ws[2], cxs[3], ws[3], spec
        )

        @pl.when(first)
        def _init(b=b, s=s, a=a):
            s_ref[0, b, 0] = s
            # channel-leading a layout: per-ch stores index a LEADING block
            # axis — lane-offset stores at nlm grain are unsupported in
            # Mosaic
            for ch in range(spec.ch_a):
                a_ref[0, b, 0, ch] = a[:, ch, :]

        @pl.when(jnp.logical_not(first))
        def _acc(b=b, s=s, a=a):
            s_ref[0, b, 0] += s
            for ch in range(spec.ch_a):
                a_ref[0, b, 0, ch] += a[:, ch, :]


def _k2b_kernel(plan: DenseGridPlan, spec: DenseNepSpec, by: int, *refs):
    c_ref, w_ref, cs_ref, ca_ref, dc_ref, dw_ref = refs
    cap = plan.cap
    first = pl.program_id(3) == 0
    for b in range(by):
        center = c_ref[0, b, 0]
        cxs = [center[k : k + 1, :].reshape(cap, 1) for k in range(4)]
        cot_s = cs_ref[0, b, 0]
        # per-channel cotangent reads off a LEADING axis (aligned); the
        # loss-scalar formulation below avoids stacking them into a 3-D
        # vreg, which Mosaic cannot concatenate from offset-carrying slices
        cot_a_chs = [ca_ref[0, b, 0, ch] for ch in range(spec.ch_a)]
        ws = [w_ref[0, b, 0, k : k + 1, :] for k in range(4)]

        def loss_fn(cx_, cy_, cz_, wx_, wy_, wz_, cxs=cxs, ws=ws,
                    cot_s=cot_s, cot_a_chs=cot_a_chs):
            s, a = _tile_chunk(
                cx_, cy_, cz_, wx_, wy_, wz_, cxs[3], ws[3], spec
            )
            tot = jnp.sum(s * cot_s)
            for ch in range(spec.ch_a):
                tot = tot + jnp.sum(a[:, ch, :] * cot_a_chs[ch])
            return tot

        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            cxs[0], cxs[1], cxs[2], ws[0], ws[1], ws[2]
        )
        for k in range(3):
            dw_ref[0, b, 0, k : k + 1, :] = grads[3 + k]
        dcen = jnp.concatenate(
            [grads[k].reshape(1, cap) for k in range(3)], axis=0
        )

        @pl.when(first)
        def _init(b=b, dcen=dcen):
            dc_ref[0, b, 0] = dcen

        @pl.when(jnp.logical_not(first))
        def _acc(b=b, dcen=dcen):
            dc_ref[0, b, 0] += dcen


def _pick_by(ny: int, cap: int, chunk: int) -> int:
    """y-cells per kernel grid step.

    MEASURED on v5e at N=1e6 (PbTe, grid 36^3, cap 32): BY=4 runs 9%
    SLOWER than BY=1 (2.84 vs 2.60 s/step) — the s/a accumulation blocks
    of all BY cells stay VMEM-resident across the innermost chunk loop,
    and that residency costs more than the per-grid-step overhead saves.
    Keep BY=1; the blocking machinery stays for future kernels whose
    outputs are not chunk-accumulated."""
    return 1


def k1b_call(centers, cand, plan: DenseGridPlan, spec: DenseNepSpec,
             interpret: bool):
    nx, ny, nz = plan.grid
    cap = plan.cap
    c_pad = cand.shape[-1]
    chunk = _chunk_lanes(cap)
    nc = c_pad // chunk
    by = _pick_by(ny, cap, chunk)
    dtype = cand.dtype
    return pl.pallas_call(
        functools.partial(_k1b_kernel, plan, spec, by),
        grid=(nz, ny // by, nx, nc),
        in_specs=[
            pl.BlockSpec((1, by, 1, 4, cap),
                         lambda z, y, x, c: (z, y, x, 0, 0)),
            pl.BlockSpec((1, by, 1, 4, chunk),
                         lambda z, y, x, c: (z, y, x, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, by, 1, cap, spec.s_width),
                lambda z, y, x, c: (z, y, x, 0, 0),
            ),
            pl.BlockSpec(
                (1, by, 1, spec.ch_a, cap, spec.nlm),
                lambda z, y, x, c: (z, y, x, 0, 0, 0),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, nx, cap, spec.s_width), dtype),
            jax.ShapeDtypeStruct(
                (nz, ny, nx, spec.ch_a, cap, spec.nlm), dtype
            ),
        ],
        interpret=interpret,
    )(centers, cand)


def k2b_call(centers, cand, cot_s, cot_a, plan: DenseGridPlan,
             spec: DenseNepSpec, interpret: bool):
    nx, ny, nz = plan.grid
    cap = plan.cap
    c_pad = cand.shape[-1]
    chunk = _chunk_lanes(cap)
    nc = c_pad // chunk
    dtype = cand.dtype
    by = _pick_by(ny, cap, chunk)
    return pl.pallas_call(
        functools.partial(_k2b_kernel, plan, spec, by),
        grid=(nz, ny // by, nx, nc),
        in_specs=[
            pl.BlockSpec((1, by, 1, 4, cap),
                         lambda z, y, x, c: (z, y, x, 0, 0)),
            pl.BlockSpec((1, by, 1, 4, chunk),
                         lambda z, y, x, c: (z, y, x, 0, c)),
            pl.BlockSpec(
                (1, by, 1, cap, spec.s_width),
                lambda z, y, x, c: (z, y, x, 0, 0),
            ),
            pl.BlockSpec(
                (1, by, 1, spec.ch_a, cap, spec.nlm),
                lambda z, y, x, c: (z, y, x, 0, 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, by, 1, 3, cap),
                         lambda z, y, x, c: (z, y, x, 0, 0)),
            pl.BlockSpec((1, by, 1, 3, chunk),
                         lambda z, y, x, c: (z, y, x, 0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, nx, 3, cap), dtype),
            jax.ShapeDtypeStruct((nz, ny, nx, 3, c_pad), dtype),
        ],
        interpret=interpret,
    )(centers, cand, cot_s, cot_a)


def dense_nep_compute_v2(
    position_slots,
    type_slots,
    slot_mask,
    box: Box,
    plan: DenseGridPlan,
    model: NepModel,
    params: NepParams,
    interpret: Optional[bool] = None,
) -> DenseNepOutput:
    """v2 fused evaluation: XLA packs per-cell candidates, Pallas runs one
    lane-aligned tile per cell (see module banner).

    Runs under matmul precision "high": TPU DEFAULT bf16 MXU passes put
    ~0.4% noise per contraction on the descriptor/ANN chain, which breaks
    the NVE drift gate (see compact_nep_compute precision note)."""
    from gpumd_tpu.engine.grid import fold_candidate_grad, pack_candidates

    with jax.default_matmul_precision("high"):
        return _dense_nep_compute_v2(
            position_slots, type_slots, slot_mask, box, plan, model, params,
            interpret, fold_candidate_grad, pack_candidates)


def _dense_nep_compute_v2(
    position_slots,
    type_slots,
    slot_mask,
    box: Box,
    plan: DenseGridPlan,
    model: NepModel,
    params: NepParams,
    interpret,
    fold_candidate_grad,
    pack_candidates,
) -> DenseNepOutput:
    spec = DenseNepSpec.from_model(model)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    garr = pack_ghost(position_slots, type_slots, slot_mask, box, plan)
    centers, cand = pack_candidates(garr, plan, lane_align=_chunk_lanes(plan.cap))
    ns = plan.n_slots
    nx, ny, nz = plan.grid
    cap = plan.cap
    ns_slab = ny * nx * cap
    type_z = type_slots.reshape(nz, ns_slab)
    mask_z = slot_mask.reshape(nz, ns_slab)
    plan_z1 = DenseGridPlan(
        grid=(nx, ny, 1), cap=cap, rc=plan.rc, skin=plan.skin, pbc=plan.pbc,
    )

    # The WHOLE per-slab pipeline (K1 forward, middle contraction, K2
    # backward) runs under one lax.map over z: the full-grid angular
    # basis/cotangent arrays would be ~2.5 GB each at 1M atoms (measured
    # OOM on a 16 GB chip); slab-wise, only the packed candidates persist
    # full-size (~0.9 GB at 1M).
    def slab(z):
        c_z = jax.lax.dynamic_slice_in_dim(centers, z, 1, 0)
        w_z = jax.lax.dynamic_slice_in_dim(cand, z, 1, 0)
        t_z = jax.lax.dynamic_slice_in_dim(type_z, z, 1, 0).reshape(ns_slab)
        m_z = jax.lax.dynamic_slice_in_dim(mask_z, z, 1, 0).reshape(ns_slab)
        s_z, a_z = k1b_call(c_z, w_z, plan_z1, spec, interpret)
        s_flat = s_z.reshape(ns_slab, spec.s_width)
        a_flat = jnp.moveaxis(a_z, 3, 4).reshape(ns_slab, spec.a_width)

        def mid(sf, af):
            e = middle_energy(sf, af, t_z, model, params)
            return e * m_z

        e_slab, vjp_mid = jax.vjp(mid, s_flat, a_flat)
        cot_s, cot_a = vjp_mid(jnp.ones_like(e_slab))
        cot_a6 = jnp.moveaxis(
            cot_a.reshape(1, ny, nx, cap, spec.ch_a, spec.nlm), 4, 3
        )
        plan_z = DenseGridPlan(
            grid=(nx, ny, 1), cap=cap, rc=plan.rc, skin=plan.skin,
            pbc=plan.pbc,
        )
        dcenter_z, dcand_z = k2b_call(
            c_z, w_z,
            cot_s.reshape(1, ny, nx, cap, spec.s_width),
            cot_a6,
            plan_z, spec, interpret,
        )
        return e_slab, dcenter_z[0], dcand_z[0]

    e_atom, dcenter, dcand = jax.lax.map(slab, jnp.arange(nz))
    e_atom = e_atom.reshape(ns)
    dg = fold_candidate_grad(dcand[..., : 27 * cap], plan, garr.dtype)
    # center cotangents land on the interior of the ghost grid
    dc = jnp.moveaxis(dcenter, 2, 3)  # (nz, ny, 3, nx, cap)
    dc = dc.reshape(nz, ny, 3, nx * cap)
    dg = dg.at[1 : 1 + nz, 1 : 1 + ny, :, cap : cap + nx * cap].add(dc)
    w_total = -jnp.einsum("zyax,zybx->ab", garr[:, :, :3], dg)
    force = -fold_ghost_grad(dg, plan) * slot_mask[:, None]
    return DenseNepOutput(energy=e_atom, force=force, virial_total=w_total)
