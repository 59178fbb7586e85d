"""PPPM reciprocal-space electrostatics (qNEP k-space backend).

TPU-native redesign of the reference PPPM (ref: src/force/pppm.cu:274-720):
the energy is assembled as ONE differentiable function

    E_rec(q, x) = K_C * sum_k G_opt(k) |S_mesh(k)|^2,

with order-5 B-spline charge assignment onto a (K2, K1, K0) mesh and the
Ballenegger/Cerda/Holm optimal influence function G_opt (JCTC 8, 936
(2012), Eqs. 2.21-2.26 — the same published polynomial approximations the
reference hardcodes, pppm.cu:38-47).  Forces, charge-gradient chains, and
Born effective charges all come from autodiff through this scalar instead
of the reference's explicit ik-field + 25-point back-interpolation kernels
(find_force_from_field) — the gradient is then exact for the *meshed*
energy, which conserves energy in MD.

The FFT is jnp.fft.fftn (XLA-native, shardable); the charge scatter is a
segment-sum over flat mesh ids (125 contributions per atom).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box
from gpumd_tpu.units import K_C

# Order-5 cardinal B-spline charge-assignment polynomials in the fractional
# offset d in (-1/2, 1/2): W[m](d) for mesh offsets m = -2..2
# (published closed form: Deserno & Holm, JCP 109, 7678 (1998), Appendix E;
# ref: pppm.cu:40-47).
_W_COEFF = np.array(
    [
        [1.0 / 384, -1.0 / 48, 1.0 / 16, -1.0 / 12, 1.0 / 24],
        [19.0 / 96, -11.0 / 24, 1.0 / 4, 1.0 / 6, -1.0 / 6],
        [115.0 / 192, 0.0, -5.0 / 8, 0.0, 1.0 / 4],
        [19.0 / 96, 11.0 / 24, 1.0 / 4, -1.0 / 6, -1.0 / 6],
        [1.0 / 384, 1.0 / 48, 1.0 / 16, 1.0 / 12, 1.0 / 24],
    ]
)

# Denominator polynomial: sum over aliases of \hat{M5}^2 as a polynomial in
# sin^2(pi n / K) (Ballenegger et al. Eq. 2.26; ref: pppm.cu:39).
_G_COEFF = np.array(
    [1.0, -5.0 / 3, 7.0 / 9, -17.0 / 189, 2.0 / 2835]
)


def best_mesh(box: Box, mesh_spacing: float = 1.0) -> Tuple[int, int, int]:
    """Power-of-two mesh size per axis, >= thickness / spacing, min 16
    (ref: pppm.cu:30-36, 591-600)."""
    t = np.asarray(box.thickness(), np.float64)
    out = []
    for d in range(3):
        k = 16
        while k < int(t[d] / mesh_spacing):
            k *= 2
        out.append(k)
    return tuple(out)


def _bspline5(d):
    """(..., 5) order-5 assignment weights at fractional offset d."""
    powers = jnp.stack([jnp.ones_like(d), d, d * d, d**3, d**4], axis=-1)
    return powers @ jnp.asarray(_W_COEFF.T, d.dtype)


def _axis_modes(k):
    n = jnp.arange(k)
    return jnp.where(n >= k // 2, n - k, n)


def k_grids(box: Box, mesh: Tuple[int, int, int], dtype=jnp.float32):
    """(kx, ky, kz, ksq) Cartesian k-vector grids, (K2, K1, K0) layout."""
    k0, k1, k2 = mesh
    two_pi = 2.0 * jnp.pi
    b = two_pi * box.h_inv.astype(dtype)  # rows are reciprocal vectors
    n0, n1, n2 = _axis_modes(k0), _axis_modes(k1), _axis_modes(k2)
    kx = (n2[:, None, None] * b[2, 0] + n1[None, :, None] * b[1, 0]
          + n0[None, None, :] * b[0, 0])
    ky = (n2[:, None, None] * b[2, 1] + n1[None, :, None] * b[1, 1]
          + n0[None, None, :] * b[0, 1])
    kz = (n2[:, None, None] * b[2, 2] + n1[None, :, None] * b[1, 2]
          + n0[None, None, :] * b[0, 2])
    return kx, ky, kz, kx * kx + ky * ky + kz * kz


def influence_function(box: Box, alpha: float, mesh: Tuple[int, int, int],
                       dtype=jnp.float32):
    """G_opt on the (K2, K1, K0) mesh (ref: find_k_and_G_opt).

    Traced (jnp) so NPT box changes flow through; mesh shape is static."""
    k0, k1, k2 = mesh
    two_pi = 2.0 * jnp.pi
    n0, n1, n2 = _axis_modes(k0), _axis_modes(k1), _axis_modes(k2)

    def denom_axis(n, k):
        t = jnp.sin(jnp.pi * n.astype(dtype) / k) ** 2
        g = jnp.asarray(_G_COEFF, dtype)
        p = ((((g[4] * t + g[3]) * t + g[2]) * t + g[1]) * t + g[0])
        return p * p

    def sinc(x):
        # stable sinc via series near 0 (ref: pppm.cu sinc)
        small = jnp.abs(x) < 1e-4
        xs = jnp.where(small, 1.0, x)
        return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)

    def numer_axis(n, k):
        return sinc(jnp.pi * n.astype(dtype) / k)

    d0 = denom_axis(n0, k0)
    d1 = denom_axis(n1, k1)
    d2 = denom_axis(n2, k2)
    u0 = numer_axis(n0, k0)
    u1 = numer_axis(n1, k1)
    u2 = numer_axis(n2, k2)

    _, _, _, ksq = k_grids(box, mesh, dtype)
    numer = (u2[:, None, None] * u1[None, :, None] * u0[None, None, :]) ** 10
    denom = d2[:, None, None] * d1[None, :, None] * d0[None, None, :]
    vol = box.volume.astype(dtype) if hasattr(box.volume, "astype") else jnp.asarray(box.volume, dtype)
    pref = two_pi / vol
    g = jnp.where(
        ksq > 0,
        numer * pref / jnp.maximum(ksq, 1e-12)
        * jnp.exp(-ksq / (4.0 * alpha * alpha)) / denom,
        0.0,
    )
    return g


def mesh_structure_factor(q, positions, box: Box,
                          mesh: Tuple[int, int, int]):
    """FFT of the B-spline-assigned charge mesh (differentiable in q, x)."""
    k0, k1, k2 = mesh
    dtype = positions.dtype
    hinv = box.h_inv.astype(dtype)
    kvec = jnp.asarray([k0, k1, k2], dtype)
    s = (positions @ hinv.T) * kvec  # fractional * K
    i0 = jnp.floor(s + 0.5)
    d = s - i0  # (-1/2, 1/2), differentiable
    w = _bspline5(d)  # (N, 3, 5)
    offs = jnp.arange(-2, 3)
    idx = (i0.astype(jnp.int32)[:, :, None] + offs[None, None, :])
    idx = jnp.mod(idx, jnp.asarray([k0, k1, k2], jnp.int32)[None, :, None])
    # flat id n0 + K0*(n1 + K1*n2) over the (5,5,5) stencil
    fid = (
        idx[:, 0, None, None, :]
        + k0 * (idx[:, 1, None, :, None] + k1 * idx[:, 2, :, None, None])
    )  # (N, 5z, 5y, 5x)
    val = (
        q[:, None, None, None]
        * w[:, 2, :, None, None] * w[:, 1, None, :, None]
        * w[:, 0, None, None, :]
    )
    mesh_flat = jax.ops.segment_sum(
        val.reshape(-1), fid.reshape(-1), num_segments=k0 * k1 * k2
    )
    return jnp.fft.fftn(mesh_flat.reshape(k2, k1, k0))


def pppm_reciprocal_energy(q, positions, box: Box, alpha: float,
                           mesh: Tuple[int, int, int]):
    """Differentiable k-space energy K_C sum_k G_opt |S_mesh|^2."""
    s_k = mesh_structure_factor(q, positions, box, mesh)
    g = influence_function(box, alpha, mesh, positions.dtype)
    return K_C * jnp.sum(g * (jnp.real(s_k) ** 2 + jnp.imag(s_k) ** 2))


def pppm_virial_total(q, positions, box: Box, alpha: float,
                      mesh: Tuple[int, int, int]):
    """Total reciprocal virial (3, 3):
    W_ab = K_C sum_k G |S|^2 (delta_ab - (0.5/alpha^2 + 2/k^2) k_a k_b)
    (ref: find_mesh_virial / find_potential_and_virial, pppm.cu:224-268)."""
    dtype = positions.dtype
    s_k = mesh_structure_factor(q, positions, box, mesh)
    g = influence_function(box, alpha, mesh, dtype)
    kx, ky, kz, ksq = k_grids(box, mesh, dtype)
    pref = K_C * g * (jnp.real(s_k) ** 2 + jnp.imag(s_k) ** 2)
    akf = jnp.where(
        ksq > 0, 0.5 / (alpha * alpha) + 2.0 / jnp.maximum(ksq, 1e-12), 0.0
    )
    e_tot = jnp.sum(pref)
    kvecs = (kx, ky, kz)
    w = jnp.zeros((3, 3), dtype)
    for a in range(3):
        for b in range(3):
            term = -jnp.sum(pref * akf * kvecs[a] * kvecs[b])
            if a == b:
                term = term + e_tot
            w = w.at[a, b].set(term)
    return w
