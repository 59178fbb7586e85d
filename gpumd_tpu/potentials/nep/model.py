"""NEP (neuroevolution potential) inference, TPU-native.

Pipeline (ref: src/force/nep.cu:488-861 kernels find_descriptor,
find_force_radial, find_partial_force_angular, find_force_ZBL):

  radial:   q_n    = sum_j g_n(r_ij),   g_n = sum_k c^{t1 t2}_{nk} f_k(r)
  angular:  s_lm^n = sum_j g^a_n(r_ij) * Q_lm(z) * Re/Im (x+iy)^m
            q_nl   = C_l0 s0^2 + 2 sum_{m>0} C_lm (s_re^2 + s_im^2)
            (+ 4-body q222 cubic / 5-body q1111 quartic invariants)
  ANN:      E_i = sum_nu w1[t1] tanh(w0[t1] . (q*scaler) - b0[t1]) - b1
            (NEP5 adds a per-type bias)
  ZBL:      screened Coulomb pair repulsion (universal or flexible)

TPU-first design decisions (vs the reference's one-thread-per-atom CUDA):
  * Energies only — partial forces come from ONE reverse-mode sweep through
    this function (see potentials/base.py), replacing ~2k lines of analytic
    gradient kernels while remaining exactly -grad E.
  * All neighbor contractions are (MN x K) @ (K x n) batched matmuls that
    map onto the MXU; per-type parameters are handled by computing all T
    type-branches and selecting (optimal for small T; a gather path can be
    added for 89-element foundation models).
  * Atoms are processed in static row blocks via lax.map so peak memory is
    bounded at any N.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput, compute_from_pair_energy
from gpumd_tpu.potentials.nep import tables
from gpumd_tpu.potentials.nep.params import NepModel, NepParams, load_nep_txt
from gpumd_tpu.units import K_C

_ZBL_UNIVERSAL = np.array(
    [0.18175, 3.1998, 0.50986, 0.94229, 0.28022, 0.4029, 0.02817, 0.20162]
)


def smooth_cutoff(d, rc):
    """fc(r) = (cos(pi r/rc) + 1)/2 for r < rc else 0 (ref: find_fc)."""
    x = d / rc
    return jnp.where(x < 1.0, 0.5 * jnp.cos(jnp.pi * x) + 0.5, 0.0)


def _chebyshev(d, rc, fc, k_max: int):
    """f_0 = fc; f_k = (T_k(x)+1)/2 * fc for k >= 1.

    x is clamped to [-1, 1]: exact for every pair inside the cutoff
    (d < rc implies x in [-1, 1]) and prevents the recurrence overflowing
    to inf*0 = NaN in f32 on padded far-away slots."""
    x = jnp.clip(2.0 * (d / rc - 1.0) ** 2 - 1.0, -1.0, 1.0)
    out = [fc]
    if k_max >= 1:
        t_prev, t_cur = jnp.ones_like(x), x
        out.append(0.5 * (t_cur + 1.0) * fc)
        for _ in range(2, k_max + 1):
            t_prev, t_cur = t_cur, 2.0 * x * t_cur - t_prev
            out.append(0.5 * (t_cur + 1.0) * fc)
    return jnp.stack(out, axis=-1)


def _pair_gn(fn, c_t1, t2, num_types: int):
    """Per-pair expansion g_n(r_ij) = sum_k c[t1,t2,n,k] f_k.

    Args:
      fn: (B, MN, K1) radial basis values.
      c_t1: (B, T, NB1, K1) c tensor already gathered at each atom's own
        type (c[t1_i]).
      t2: (B, MN) neighbor types.
    Returns: (B, MN, NB1).
    """
    out = 0.0
    for t in range(num_types):
        gm = jnp.einsum(
            "pmk,pnk->pmn", fn, c_t1[:, t], preferred_element_type=fn.dtype
        )
        out = out + gm * (t2 == t)[..., :, None]
    return out


def _angular_components(u, gn12, l_max: int, dtype):
    """s components (B, NA1, C) with C = l_max (l_max + 2), from unit bond
    vectors u (B, MN, 3) and per-pair radial factors gn12 (B, MN, NA1)."""
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    # z powers and Legendre-part polynomials for every (L, m).
    zp = [jnp.ones_like(z)]
    for _ in range(l_max):
        zp.append(zp[-1] * z)
    zpow = jnp.stack(zp, axis=-1)  # (B, MN, l_max+1)

    # (x+iy)^m for m = 0..l_max.
    cr = [jnp.ones_like(x)]
    ci = [jnp.zeros_like(x)]
    for _ in range(l_max):
        cr.append(cr[-1] * x - ci[-1] * y)
        ci.append(cr[-2] * y + ci[-1] * x)
    # note: cr[-2] is the previous real part (append order above).

    comps = []
    for L in range(1, l_max + 1):
        ztab = jnp.asarray(tables.z_coefficient_table(L), dtype=dtype)
        # zf[m] = Q_{L,m}(z): (B, MN, L+1)
        zf = jnp.einsum("pmk,lk->pml", zpow[..., : L + 1], ztab)
        comps.append(zf[..., 0])  # m = 0
        for m in range(1, L + 1):
            comps.append(zf[..., m] * cr[m])
            comps.append(zf[..., m] * ci[m])
    ylm = jnp.stack(comps, axis=-1)  # (B, MN, C)
    # Contract over neighbors: s[p, n, c] = sum_m gn12[p,m,n] ylm[p,m,c].
    return jnp.einsum(
        "pmn,pmc->pnc", gn12, ylm, preferred_element_type=gn12.dtype
    )


def _angular_q(s, model: NepModel, dtype, channels_last: bool = True):
    """Rotation invariants from s components.

    With channels_last (the list path): s is (B, NA1, NLM), returns
    (B, num_l, NA1) laid out L-major (find_q ordering).  With
    channels_last=False (the compact engine's block layout, atoms on the
    TPU lane axis): s is (B, NA1, NLM, A), returns (B, num_l, NA1, A) —
    identical math, lm-channel axis at -2.
    """
    l_max = model.l_max
    c3b = tables.c3b_flat(l_max)
    # weight 1 for m=0 component of each L, 2 for the others.
    w = []
    for L in range(1, l_max + 1):
        w += [1.0] + [2.0] * (2 * L)
    w = np.asarray(w) * c3b
    if channels_last:
        def pick(k):
            return s[..., k]

        def q3_term(lo, hi, wl):
            return jnp.einsum("...nc,c->...n", s[..., lo:hi] ** 2, wl)
    else:
        def pick(k):
            return s[..., k, :]

        def q3_term(lo, hi, wl):
            return jnp.einsum("...nca,c->...na", s[..., lo:hi, :] ** 2, wl)
    q3 = []
    for L in range(1, l_max + 1):
        lo, hi = L * L - 1, (L + 1) * (L + 1) - 1
        wl = jnp.asarray(w[lo:hi], dtype=dtype)
        q3.append(q3_term(lo, hi, wl))
    q = q3  # list of (B, NA1[, A])

    has = model.has_q
    if has[0]:  # q_222: cubic L=2 invariant (find_q, C4B)
        c4 = tables.C4B
        s3, s4, s5, s6, s7 = (pick(k) for k in range(3, 8))
        q.append(
            c4[0] * s3**3
            + c4[1] * s3 * (s4**2 + s5**2)
            + c4[2] * s3 * (s6**2 + s7**2)
            + c4[3] * s6 * (s5**2 - s4**2)
            + c4[4] * s4 * s5 * s7
        )
    if has[1]:  # q_1111: quartic L=1 invariant (C5B)
        c5 = tables.C5B
        s0sq = pick(0) ** 2
        s12sq = pick(1) ** 2 + pick(2) ** 2
        q.append(c5[0] * s0sq**2 + c5[1] * s0sq * s12sq + c5[2] * s12sq**2)
    # Extended 4-body invariants mixing different L channels
    # (ref: find_q, nep_utilities.cuh:1578-1700). s component indices:
    # L=1 -> 0..2, L=2 -> 3..7, L=3 -> 8..14, L=4 -> 15..23.
    nlm_total = s.shape[-1] if channels_last else s.shape[-2]
    sc = [pick(k) for k in range(nlm_total)] if any(has[2:]) else None
    if has[2]:  # q_112 (L=1 x L=1 x L=2)
        c = tables.C4B2
        q.append(
            c[0] * sc[0] ** 2 * sc[3]
            + c[1] * sc[0] * (sc[1] * sc[4] + sc[2] * sc[5])
            + c[2] * sc[3] * (sc[1] ** 2 + sc[2] ** 2)
            + c[3] * sc[6] * (sc[1] ** 2 - sc[2] ** 2)
            + c[4] * sc[1] * sc[2] * sc[7]
        )
    if has[3]:  # q_123 (needs l_max >= 3)
        c = tables.C4B_123
        q.append(
            c[6] * (sc[12] * sc[2] * sc[4] - sc[11] * sc[2] * sc[5]
                    + sc[1] * sc[11] * sc[4] + sc[1] * sc[12] * sc[5])
            + c[5] * (sc[0] * sc[11] * sc[6] + sc[0] * sc[12] * sc[7])
            + c[3] * (sc[14] * sc[2] * sc[6] - sc[13] * sc[2] * sc[7]
                      + sc[1] * sc[13] * sc[6] + sc[1] * sc[14] * sc[7])
            + c[4] * (sc[10] * sc[0] * sc[5] + sc[0] * sc[4] * sc[9])
            + c[1] * (sc[10] * sc[2] * sc[3] + sc[0] * sc[3] * sc[8]
                      + sc[1] * sc[3] * sc[9])
            + c[0] * (sc[10] * sc[2] * sc[6] - sc[10] * sc[1] * sc[7]
                      - sc[2] * sc[7] * sc[9] - sc[1] * sc[6] * sc[9])
            + c[2] * (-sc[2] * sc[5] * sc[8] - sc[1] * sc[4] * sc[8])
        )
    if has[4]:  # q_233 (needs l_max >= 3)
        c = tables.C4B_233
        q.append(
            c[0] * (sc[3] * sc[8] ** 2)
            + c[1] * (sc[10] ** 2 * sc[3] + sc[3] * sc[9] ** 2)
            + c[2] * (-sc[10] ** 2 * sc[6] + sc[6] * sc[9] ** 2)
            + c[3] * (sc[4] * sc[8] * sc[9] + sc[10] * sc[5] * sc[8])
            + c[4] * (-sc[13] ** 2 * sc[3] - sc[14] ** 2 * sc[3])
            + c[5] * (-sc[14] * sc[7] * sc[9] - sc[13] * sc[6] * sc[9]
                      - sc[10] * sc[14] * sc[6] + sc[10] * sc[13] * sc[7])
            + c[6] * (sc[10] * sc[7] * sc[9])
            + c[7] * (-sc[11] * sc[6] * sc[8] - sc[12] * sc[7] * sc[8])
            + c[8] * (sc[11] * sc[4] * sc[9] + sc[12] * sc[5] * sc[9]
                      + sc[10] * sc[12] * sc[4] - sc[10] * sc[11] * sc[5])
            + c[9] * (sc[12] * sc[14] * sc[4] + sc[11] * sc[14] * sc[5]
                      + sc[13] * sc[11] * sc[4] - sc[13] * sc[12] * sc[5])
        )
    if has[5]:  # q_134 (needs l_max >= 4)
        c = tables.C4B_134
        q.append(
            c[0] * (-sc[10] * sc[15] * sc[2] - sc[1] * sc[15] * sc[9])
            + c[1] * (sc[0] * sc[15] * sc[8])
            + c[2] * (-sc[1] * sc[13] * sc[18] - sc[1] * sc[14] * sc[19]
                      - sc[2] * sc[14] * sc[18] + sc[2] * sc[13] * sc[19])
            + c[3] * (-sc[10] * sc[18] * sc[2] + sc[1] * sc[10] * sc[19]
                      + sc[1] * sc[18] * sc[9] + sc[2] * sc[19] * sc[9])
            + c[4] * (sc[1] * sc[16] * sc[8] + sc[2] * sc[17] * sc[8])
            + c[5] * (sc[0] * sc[10] * sc[17] + sc[0] * sc[16] * sc[9]
                      - sc[1] * sc[11] * sc[16] - sc[1] * sc[12] * sc[17]
                      - sc[2] * sc[12] * sc[16] + sc[2] * sc[11] * sc[17])
            + c[6] * (sc[1] * sc[13] * sc[22] + sc[1] * sc[14] * sc[23]
                      - sc[2] * sc[14] * sc[22] + sc[2] * sc[13] * sc[23])
            + c[7] * (sc[0] * sc[11] * sc[18] + sc[0] * sc[12] * sc[19])
            + c[8] * (sc[0] * sc[13] * sc[20] + sc[0] * sc[14] * sc[21])
            + c[9] * (sc[1] * sc[11] * sc[20] + sc[1] * sc[12] * sc[21]
                      - sc[2] * sc[12] * sc[20] + sc[2] * sc[11] * sc[21])
        )
    return jnp.stack(q, axis=1)  # (B, num_l, NA1)


# Covalent radii (A) indexed by Z-1, used by the typewise ZBL cutoff
# (published data re-entered from ref: nep_utilities.cuh:143-153)
_COVALENT_RADIUS = np.array([
    0.426667, 0.613333, 1.6, 1.25333, 1.02667, 1.0, 0.946667, 0.84,
    0.853333, 0.893333, 1.86667, 1.66667, 1.50667, 1.38667, 1.46667,
    1.36, 1.32, 1.28, 2.34667, 2.05333, 1.77333, 1.62667, 1.61333,
    1.46667, 1.42667, 1.38667, 1.33333, 1.32, 1.34667, 1.45333, 1.49333,
    1.45333, 1.53333, 1.46667, 1.52, 1.56, 2.52, 2.22667, 1.96, 1.85333,
    1.76, 1.65333, 1.53333, 1.50667, 1.50667, 1.44, 1.53333, 1.64,
    1.70667, 1.68, 1.68, 1.64, 1.76, 1.74667, 2.78667, 2.34667, 2.16,
    1.96, 2.10667, 2.09333, 2.08, 2.06667, 2.01333, 2.02667, 2.01333,
    2.0, 1.98667, 1.98667, 1.97333, 2.04, 1.94667, 1.82667, 1.74667,
    1.64, 1.57333, 1.54667, 1.48, 1.49333, 1.50667, 1.76, 1.73333,
    1.73333, 1.81333, 1.74667, 1.84, 1.89333, 2.68, 2.41333, 2.22667,
    2.10667, 2.02667, 2.04, 2.05333, 2.06667,
])


def _zbl_energy(d, t1, t2, model: NepModel, params: NepParams, dtype):
    """Universal / flexible ZBL pair energy, halved per ordered pair
    (ref: find_force_ZBL nep.cu:863-975, find_f_and_fp_zbl).  With
    `zbl_typewise_factor` > 0 the outer cutoff shrinks per pair to
    min(factor * (rcov_i + rcov_j), rc_outer) with rc_inner = 0
    (ref: nep.cu:935-941)."""
    zn = jnp.asarray(model.atomic_numbers, dtype=dtype)
    zi = zn[t1][..., None] * jnp.ones_like(d)
    zj = zn[t2]
    a_inv = (zi**0.23 + zj**0.23) * 2.134563
    zizj = K_C * zi * zj
    x = d * a_inv

    if model.zbl_flexible:
        # symmetric pair index: t1<=t2 -> t1*T - t1(t1-1)/2 + (t2-t1)
        ta = jnp.minimum(t1[..., None], t2)
        tb = jnp.maximum(t1[..., None], t2)
        pair_idx = ta * model.num_types - (ta * (ta - 1)) // 2 + (tb - ta)
        pp = params.zbl_flex[pair_idx]  # (..., 10)
        rc1, rc2 = pp[..., 0], pp[..., 1]
        phi = (
            pp[..., 2] * jnp.exp(-pp[..., 3] * x)
            + pp[..., 4] * jnp.exp(-pp[..., 5] * x)
            + pp[..., 6] * jnp.exp(-pp[..., 7] * x)
            + pp[..., 8] * jnp.exp(-pp[..., 9] * x)
        )
    else:
        if model.zbl_typewise_factor > 0.0:
            rcov = jnp.asarray(
                _COVALENT_RADIUS[
                    np.maximum(np.asarray(model.atomic_numbers) - 1, 0)
                ],
                dtype,
            )
            rc2 = jnp.minimum(
                (rcov[t1][..., None] + rcov[t2])
                * model.zbl_typewise_factor,
                model.zbl_rc_outer,
            ) * jnp.ones_like(d)
            rc1 = jnp.zeros_like(d)
        else:
            rc1 = jnp.full_like(d, model.zbl_rc_inner)
            rc2 = jnp.full_like(d, model.zbl_rc_outer)
        zp = _ZBL_UNIVERSAL
        phi = (
            zp[0] * jnp.exp(-zp[1] * x)
            + zp[2] * jnp.exp(-zp[3] * x)
            + zp[4] * jnp.exp(-zp[5] * x)
            + zp[6] * jnp.exp(-zp[7] * x)
        )
    # outer cutoff switch (find_fc_and_fcp_zbl)
    frac = (d - rc1) / jnp.maximum(rc2 - rc1, 1e-30)
    fc = jnp.where(
        d < rc1, 1.0, jnp.where(d < rc2, 0.5 * jnp.cos(jnp.pi * frac) + 0.5, 0.0)
    )
    return 0.5 * zizj / d * phi * fc


def ann_energy(q_scaled, t1, params: NepParams, dtype):
    """Per-atom ANN energy from scaled descriptors (ref: apply_ann_one_layer
    / _nep5, nep_utilities.cuh): all type branches evaluated then selected —
    MXU-friendly for small type counts."""
    w0 = params.w0.astype(dtype)
    b0 = params.b0.astype(dtype)
    w1 = params.w1.astype(dtype)
    x1 = jnp.tanh(
        jnp.einsum("pd,tud->ptu", q_scaled, w0, preferred_element_type=dtype)
        - b0[None]
    )
    e_t = jnp.einsum("ptu,tu->pt", x1, w1) - params.b1_type.astype(dtype)[None]
    e = jnp.take_along_axis(e_t, t1[:, None], axis=1)[:, 0]
    return e - params.b1.astype(dtype)


class NEP(NamedTuple):
    """NEP potential (pytree of params + static model config)."""

    model: NepModel
    params: NepParams
    # Electron/target temperature (K) for model_type 3 (nep*_temperature):
    # enters as the last descriptor component (ref: nep.cu:1483, fed from
    # the ensemble's target temperature, run.cu:679-681).
    temperature: Optional[jnp.ndarray] = None

    @property
    def rc(self) -> float:
        return self.model.rc_radial_max

    @staticmethod
    def from_file(path: str, dtype=None) -> "NEP":
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        model, params = load_nep_txt(path, dtype=dtype)
        return NEP(model=model, params=params)

    def restrict(self, present_symbols) -> "NEP":
        """NEP sliced to the species actually present in a simulation.

        Foundation models (nep89-style, ref: src/force/nep.cu:100-395
        handles them with full type tables in the kernel) carry up to 89
        trained types, but the dense/compact TPU engines unroll per-pair
        type branches as T^2 — intractable at 89.  Any one simulation
        contains only a few species, so slicing the type tables to the
        present set (preserving model order) keeps the fast path open with
        IDENTICAL numerics: every per-type table is gathered by (t_i, t_j)
        only.  System type codes must be remapped with the returned
        model's symbol order.
        """
        import dataclasses

        old = [str(s) for s in self.model.symbols]
        present = [s for s in old if s in set(present_symbols)]
        missing = set(present_symbols) - set(old)
        if missing:
            raise ValueError(f"species {sorted(missing)} not in the model")
        sel = np.asarray([old.index(s) for s in present])
        m = self.model
        model = dataclasses.replace(
            m,
            num_types=len(present),
            symbols=tuple(present),
            atomic_numbers=tuple(m.atomic_numbers[i] for i in sel),
            rc_radial=tuple(m.rc_radial[i] for i in sel),
            rc_angular=tuple(m.rc_angular[i] for i in sel),
        )
        p = self.params

        def tsel(a):
            return None if a is None else a[sel]

        zbl_flex = None
        if p.zbl_flex is not None:
            t_old = m.num_types

            def pidx(a, b, t):
                a, b = min(a, b), max(a, b)
                return a * t - (a * (a - 1)) // 2 + (b - a)

            rows = [
                pidx(int(sel[a]), int(sel[b]), t_old)
                for a in range(len(sel))
                for b in range(a, len(sel))
            ]
            zbl_flex = p.zbl_flex[np.asarray(rows)]
        params = p._replace(
            w0=tsel(p.w0), b0=tsel(p.b0), w1=tsel(p.w1),
            b1_type=tsel(p.b1_type),
            c_radial=p.c_radial[sel][:, sel],
            c_angular=p.c_angular[sel][:, sel],
            zbl_flex=zbl_flex,
            w0_pol=tsel(p.w0_pol), b0_pol=tsel(p.b0_pol),
            w1_pol=tsel(p.w1_pol),
            w1_charge=tsel(p.w1_charge),
        )
        return self._replace(model=model, params=params)

    def remap_types(self, types, original_symbols) -> np.ndarray:
        """Map type codes of the ORIGINAL (unrestricted) model to this
        model's compact codes."""
        old = [str(s) for s in original_symbols]
        lut = np.full(len(old), -1, np.int32)
        for i, s in enumerate(self.model.symbols):
            lut[old.index(s)] = i
        out = lut[np.asarray(types)]
        if (out < 0).any():
            raise ValueError("types present that the restricted model lacks")
        return out

    # ---- descriptor + energy ------------------------------------------------

    def pair_energies(self, r12, t1, t2):
        """Unified potential protocol: per-atom energies from displacements
        and center/neighbor types."""
        return self.per_atom_energy(r12, t1, t2)

    def per_atom_energy(self, r12, t1, t2, block: int = 4096):
        """Per-atom energies (N,) from displacements r12 (N, MN, 3) and the
        center/neighbor types. Processes atoms in static blocks."""
        n = r12.shape[0]
        model, params = self.model, self.params
        dtype = r12.dtype

        # Rematerialize descriptor intermediates in the backward pass so the
        # vjp through lax.map stores only (B,) energies per block, not the
        # (B, MN, ...) expansion tensors — bounds memory at 1M+ atoms.
        block_fn = jax.checkpoint(self._block_energy)

        def block_energy(args):
            r12b, t1b, t2b = args
            return block_fn(r12b, t1b, t2b)

        if n <= block:
            return block_fn(r12, t1, t2)
        nb = -(-n // block)
        pad = nb * block - n
        r12p = jnp.pad(r12, ((0, pad), (0, 0), (0, 0)), constant_values=1e5)
        t1p = jnp.pad(t1, (0, pad))
        t2p = jnp.pad(t2, ((0, pad), (0, 0)))
        e = jax.lax.map(
            block_energy,
            (
                r12p.reshape(nb, block, *r12.shape[1:]),
                t1p.reshape(nb, block),
                t2p.reshape(nb, block, -1),
            ),
        )
        return e.reshape(-1)[:n]

    def b_projection(self, r12, t1, t2):
        """Per-atom gradient of its energy wrt its element's ANN parameters,
        layout [dE/dw0[n,:], dE/db0[n], dE/dw1[n]] per neuron n — the
        MaxVol active-learning feature vector (ref: nep_utilities.cuh:
        254-283 apply_ann_one_layer B_projection branch, nep.cu:394)."""
        params = self.params
        dtype = r12.dtype
        q_raw, _ = self.raw_descriptors(r12, t1, t2)
        q = q_raw * params.q_scaler.astype(dtype)
        w0 = params.w0.astype(dtype)[t1]  # (B, neu, dim)
        b0 = params.b0.astype(dtype)[t1]
        w1 = params.w1.astype(dtype)[t1]
        x1 = jnp.tanh(
            jnp.einsum("pud,pd->pu", w0, q, preferred_element_type=dtype) - b0
        )
        td = 1.0 - x1 * x1
        dw0 = td[:, :, None] * q[:, None, :] * w1[:, :, None]
        db0 = -td * w1
        b = jnp.concatenate(
            [dw0, db0[..., None], x1[..., None]], axis=-1
        )  # (B, neu, dim + 2)
        return b.reshape(b.shape[0], -1)

    def raw_descriptors(self, r12, t1, t2):
        """Unscaled per-atom descriptor vectors q (B, dim) — used by the
        trainer to derive q_scaler (ref: find_max_min, main_nep/nep.cu)."""
        model, params = self.model, self.params
        dtype = r12.dtype
        t = model.num_types
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))  # (B, MN)

        rc_r = jnp.asarray(model.rc_radial, dtype=dtype)
        rc_a = jnp.asarray(model.rc_angular, dtype=dtype)
        rcp_r = 0.5 * (rc_r[t1][:, None] + rc_r[t2])
        rcp_a = 0.5 * (rc_a[t1][:, None] + rc_a[t2])

        # --- radial block
        fc_r = smooth_cutoff(d, rcp_r)
        fn_r = _chebyshev(d, rcp_r, fc_r, model.basis_size_radial)
        cr_t1 = params.c_radial[t1].astype(dtype)  # (B, T, NR1, K1)
        gn_r = _pair_gn(fn_r, cr_t1, t2, t)  # (B, MN, NR1)
        q_rad = jnp.sum(gn_r, axis=1)  # (B, NR1)

        # --- angular block
        fc_a = smooth_cutoff(d, rcp_a)
        fn_a = _chebyshev(d, rcp_a, fc_a, model.basis_size_angular)
        ca_t1 = params.c_angular[t1].astype(dtype)
        gn_a = _pair_gn(fn_a, ca_t1, t2, t)  # (B, MN, NA1)
        u = r12 / d[..., None]
        s = _angular_components(u, gn_a, model.l_max, dtype)  # (B, NA1, C)
        q_ang = _angular_q(s, model, dtype)  # (B, num_l, NA1)

        return jnp.concatenate(
            [q_rad, q_ang.reshape(q_ang.shape[0], -1)], axis=-1
        ), d

    def _block_energy(self, r12, t1, t2):
        model, params = self.model, self.params
        dtype = r12.dtype
        q, d = self.raw_descriptors(r12, t1, t2)
        if model.model_type == 3:
            if self.temperature is None:
                raise ValueError(
                    "temperature-mode NEP needs NEP.temperature set (the "
                    "app wires the ensemble target temperature)"
                )
            tcol = jnp.full((q.shape[0], 1), self.temperature, dtype)
            q = jnp.concatenate([q, tcol], axis=-1)
        q = q * params.q_scaler.astype(dtype)
        e = ann_energy(q, t1, params, dtype)

        if model.zbl:
            uz = _zbl_energy(d, t1, t2, model, params, dtype)
            # the ZBL switch vanishes beyond rc_outer; padded slots are far.
            e = e + jnp.sum(uz, axis=-1)
        return e

    # ---- tensorial observables (TNEP) ----------------------------------------

    def dipole(self, type_, nbr: NeighborList, mask):
        """Global dipole vector of a nep*_dipole model (ref: nep.cu:737-742:
        mu_alpha = sum_i sum_j -|r12|^2 f21_alpha, f21 = mirror partial)."""
        if self.model.model_type != 1:
            raise ValueError("dipole() needs a _dipole model")
        t2 = type_[nbr.idx]
        e_atom, vjp = jax.vjp(
            lambda r12: self.per_atom_energy(r12, type_, t2), nbr.r12
        )
        (p,) = vjp(mask.astype(nbr.r12.dtype))
        # gather mirror partials
        from gpumd_tpu.neighbor.neighbor import gather_vec3

        n, mn = nbr.idx.shape
        if nbr.rev is not None:
            p_rev = gather_vec3(p.reshape(-1, 3), nbr.rev) * nbr.mask[..., None]
            r2 = jnp.sum(nbr.r12**2, axis=-1) * nbr.mask
            return -jnp.einsum("nm,nma->a", r2, p_rev)
        # pair-mirror symmetry: identical sum over ordered pairs
        r2 = jnp.sum(nbr.r12**2, axis=-1) * nbr.mask
        return -jnp.einsum("nm,nma->a", r2, p)

    def polarizability(self, type_, nbr: NeighborList, mask):
        """Polarizability tensor of a nep*_polarizability model
        (ref: find_descriptor is_polarizability: diagonal from the second
        ANN head + the standard r12 (x) f21 virial terms)."""
        if self.model.model_type != 2:
            raise ValueError("polarizability() needs a _polarizability model")
        t2 = type_[nbr.idx]
        out = compute_from_pair_energy(
            lambda r12: self.per_atom_energy(r12, type_, t2), nbr, mask
        )
        w_total = jnp.sum(out.virial * mask[:, None, None], axis=0)
        # second-head per-atom scalar on the diagonal
        dtype = nbr.r12.dtype
        q, _ = self.raw_descriptors(nbr.r12, type_, t2)
        q = q * self.params.q_scaler.astype(dtype)
        x1 = jnp.tanh(
            jnp.einsum("pd,tud->ptu", q, self.params.w0_pol.astype(dtype))
            - self.params.b0_pol.astype(dtype)[None]
        )
        f_t = jnp.einsum("ptu,tu->pt", x1, self.params.w1_pol.astype(dtype))
        f_pol = jnp.take_along_axis(f_t, type_[:, None], axis=1)[:, 0]
        f_pol = (f_pol - self.params.b1_pol.astype(dtype)) * mask
        return w_total + jnp.sum(f_pol) * jnp.eye(3, dtype=dtype)

    # ---- Potential interface -------------------------------------------------

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]

        def energy_fn(r12):
            return self.per_atom_energy(r12, type_, t2)

        # matmul precision "high": TPU DEFAULT bf16 MXU passes put ~0.4%
        # noise on the ANN/descriptor contractions and their VJP, which
        # breaks the NVE drift gate (see compact_nep_compute)
        with jax.default_matmul_precision("high"):
            return compute_from_pair_energy(
                energy_fn, nbr, mask, per_atom_virial=per_atom_virial
            )
