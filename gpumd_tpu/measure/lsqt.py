"""LSQT: linear-scaling quantum transport on MD positions.

TPU-native rebuild of the reference LSQT (ref: src/measure/lsqt.cu):
a tight-binding Hamiltonian is built on the instantaneous MD geometry and
the energy-resolved DOS, carrier velocity, and running conductivity
sigma(E, t) are computed with Chebyshev machinery:

  * KPM moments mu_m = <sl| T_m(H~) |sr> with Jackson damping for the
    delta-function resolution (ref: find_moments_chebyshev/apply_damping/
    perform_chebyshev_summation);
  * U(dt)|s> via the Chebyshev-Bessel expansion of exp(-i H t / hbar)
    (ref: evolve, gpu_chebyshev_01/2);
  * current operator J|s> = i [H, X] |s> using per-bond hopping distances
    (ref: gpu_apply_current).

Everything is one jit per sample: states are complex arrays, H|s> is a
(N, MN) gather+contraction, the moment loop is a lax.scan — no kernels to
hand-schedule.  The tight-binding model here is the single-pi-orbital
carbon model (hopping -2.7 (1.42/d)^2 eV within 2.1 A — the reference's
USE_GRAPHENE_TB variant, lsqt.cu:503-550); the 4-orbital sp3 model is a
planned drop-in (same operator shapes, per-orbital blocks).

Outputs per sample: lsqt_dos.out (states/eV/atom), lsqt_velocity.out
(m/s), lsqt_sigma.out (S/m, running time integral).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from gpumd_tpu.units import TIME_UNIT_CONVERSION

# GPUMD natural time -> hbar/eV (ref: lsqt.cu preprocess: * 15.46692)
_TIME_TO_HBAR_EV = 15.46692


def _jackson(nm: int) -> np.ndarray:
    k = np.arange(nm)
    a = 1.0 / (nm + 1.0)
    return (1.0 - k * a) * np.cos(k * np.pi * a) + np.sin(k * np.pi * a) * (
        a / np.tan(np.pi * a)
    )


def _bessel_coeffs(x: float, max_m: int = 10000) -> np.ndarray:
    from scipy.special import jv

    out = [jv(0, x), 2.0 * jv(1, x)]
    for m in range(2, max_m):
        b = jv(m, x)
        if abs(b) < 1e-15:
            break
        out.append(2.0 * b)
    return np.asarray(out)


class LSQT:
    """compute_lsqt x|y|z Nm Ne E_start E_end E_max (ref: lsqt.cu parse)."""

    def __init__(self, direction, n_moments, n_energies, e_start, e_end,
                 e_max, dt, rc=2.1, mn=10, seed=13, model="graphene"):
        self.direction = {"x": 0, "y": 1, "z": 2}[direction]
        self.model = model  # "graphene" (pi orbital) | "sp3" (4 orbitals)
        self.nm = int(n_moments)
        self.ne = int(n_energies)
        self.e = np.linspace(e_start, e_end, self.ne)
        self.em = float(e_max)
        self.dt_hbar = dt * _TIME_TO_HBAR_EV
        self.rc = rc
        self.mn = mn
        self.seed = seed
        self.interval = 1
        self._sl = None  # evolving left state
        self._sr = None
        self._sigma = np.zeros(self.ne)
        self._damp = jnp.asarray(_jackson(self.nm))
        self._bessel = jnp.asarray(
            _bessel_coeffs(self.dt_hbar * self.em)
        )
        self._step_fns = None

    # ---- Hamiltonian on the current geometry -----------------------------

    def _build_h(self, state):
        from gpumd_tpu.model.box import Box, num_replicas_for_cutoff
        from gpumd_tpu.neighbor.neighbor import neighbor_brute

        n = int(np.asarray(state.mask).sum())
        pos = jnp.asarray(np.asarray(state.position)[:n])
        box = state.box
        reps = num_replicas_for_cutoff(box, self.rc)
        nbr = neighbor_brute(pos, box, jnp.ones(n), rc=self.rc, mn=self.mn,
                             reps=reps)
        d = jnp.sqrt(jnp.sum(nbr.r12**2, axis=-1))
        if self.model == "sp3":
            return self._sp3_orbitals(n, nbr, d)
        # pi-orbital carbon TB: t(d) = -2.7 (1.42/d)^2 (ref: lsqt.cu:545)
        hop = jnp.where(nbr.mask > 0, -2.7 * 1.42**2 / jnp.maximum(d, 0.1) ** 2,
                        0.0)
        xx = jnp.where(nbr.mask > 0, nbr.r12[..., self.direction], 0.0)
        idx = jnp.minimum(nbr.idx, n - 1)
        u = jnp.zeros((n,))
        return u, hop, xx, idx

    def _sp3_orbitals(self, n, nbr, d):
        """Carbon sp3 Slater-Koster model, 4 orbitals (s, px, py, pz) per
        atom with GSP distance scaling (ref: lsqt.cu:554-643 and the TB
        struct lsqt.cuh:33-42).  Orbital site index = atom + k * N."""
        onsite = jnp.asarray([-2.99, 3.71, 3.71, 3.71])
        v_sss, v_sps, v_pps, v_ppp = -5.0, 4.7, 5.5, -1.55
        nc, rc_tb, r0 = 6.5, 2.18, 1.536329
        mn = nbr.idx.shape[1]
        dd = jnp.maximum(d, 0.1)
        s12 = (r0 / dd) ** 2 * jnp.exp(
            2.0 * (-((dd / rc_tb) ** nc) + (r0 / rc_tb) ** nc)
        )
        s12 = jnp.where(nbr.mask > 0, s12, 0.0)
        cx = nbr.r12[..., 0] / dd
        cy = nbr.r12[..., 1] / dd
        cz = nbr.r12[..., 2] / dd
        z = jnp.zeros_like(cx)
        # H12[k1][k2] (N, MN) blocks (ref: :607-624)
        h = jnp.stack([
            jnp.stack([jnp.full_like(cx, v_sss), v_sps * cx,
                       v_sps * cy, v_sps * cz], -1),
            jnp.stack([-v_sps * cx, v_pps * cx**2 + v_ppp * (1 - cx**2),
                       (v_pps - v_ppp) * cx * cy,
                       (v_pps - v_ppp) * cz * cx], -1),
            jnp.stack([-v_sps * cy, (v_pps - v_ppp) * cx * cy,
                       v_pps * cy**2 + v_ppp * (1 - cy**2),
                       (v_pps - v_ppp) * cy * cz], -1),
            jnp.stack([-v_sps * cz, (v_pps - v_ppp) * cz * cx,
                       (v_pps - v_ppp) * cy * cz,
                       v_pps * cz**2 + v_ppp * (1 - cz**2)], -1),
        ], -2)  # (N, MN, 4k1, 4k2)
        del z
        h = h * s12[..., None, None]
        # orbital layout: row = n + k1*N, col = k2*MN + i1
        hop = jnp.transpose(h, (2, 0, 3, 1)).reshape(4 * n, 4 * mn)
        idx_a = jnp.minimum(nbr.idx, n - 1)  # (N, MN)
        idx = (
            idx_a[None, :, None, :]
            + jnp.arange(4)[None, None, :, None] * n
        )
        idx = jnp.broadcast_to(idx, (4, n, 4, mn)).reshape(4 * n, 4 * mn)
        xr = jnp.where(nbr.mask > 0, nbr.r12[..., self.direction], 0.0)
        xx = jnp.broadcast_to(
            xr[None, :, None, :], (4, n, 4, mn)
        ).reshape(4 * n, 4 * mn)
        u = jnp.repeat(onsite, n)
        return u, hop, xx, idx

    # ---- operators (all jit-friendly) ------------------------------------

    @staticmethod
    def _h_apply(s, u, hop, idx, em_inv):
        return (u * s + jnp.einsum("nm,nm->n", hop + 0j, s[idx])) * em_inv

    @staticmethod
    def _j_apply(s, hop, xx, idx):
        # J|s>: sor = +Im, soi = -Re of sum hop*x*s  ->  -i * sum(...)
        t = jnp.einsum("nm,nm->n", (hop * xx) + 0j, s[idx])
        return -1j * t

    def _moments(self, sl, sr, u, hop, idx):
        em_inv = 1.0 / self.em

        s0 = sr
        s1 = self._h_apply(sr, u, hop, idx, em_inv)
        m0 = jnp.real(jnp.vdot(sl, s0))
        m1 = jnp.real(jnp.vdot(sl, s1))

        def body(carry, _):
            s0, s1 = carry
            s2 = 2.0 * self._h_apply(s1, u, hop, idx, em_inv) - s0
            return (s1, s2), jnp.real(jnp.vdot(sl, s2))

        (_, _), ms = jax.lax.scan(body, (s0, s1), None, length=self.nm - 2)
        return jnp.concatenate([jnp.stack([m0, m1]), ms])

    def _summation(self, moments):
        eps = jnp.asarray(self.e / self.em)
        mom = moments * self._damp

        def corr(e_scaled):
            def body(carry, m):
                c0, c1, acc = carry
                c2 = 2.0 * e_scaled * c1 - c0
                return (c1, c2, acc + m * c2), None

            (c0, c1, acc), _ = jax.lax.scan(
                body, (jnp.asarray(1.0), e_scaled, mom[1] * e_scaled),
                mom[2:],
            )
            t = 2.0 * acc + mom[0]
            return t * 2.0 / (jnp.pi * jnp.sqrt(1.0 - e_scaled**2)) / self.em

        return jax.vmap(corr)(eps)

    def _evolve(self, s, u, hop, idx, direction):
        """U(direction * dt)|s> by the Chebyshev-Bessel series
        (ref: evolve/gpu_chebyshev_01/2 label table)."""
        em_inv = 1.0 / self.em
        nb = self._bessel.shape[0]
        s0 = s
        s1 = self._h_apply(s, u, hop, idx, em_inv)
        out = self._bessel[0] * s0 + self._bessel[1] * direction * (-1j) * s1

        def body(carry, bm):
            s0, s1, out, m = carry
            s2 = 2.0 * self._h_apply(s1, u, hop, idx, em_inv) - s0
            # coefficient i^{-m} for U(-t): phases cycle 1, -i, -1, i
            m4 = jnp.mod(m, 4)
            phase = jnp.where(
                m4 == 0, 1.0 + 0j,
                jnp.where(
                    m4 == 2, -1.0 + 0j,
                    jnp.where(m4 == 1, -1j * direction, 1j * direction),
                ),
            )
            out = out + bm * phase * s2
            return (s1, s2, out, m + 1), None

        (s0, s1, out, _), _ = jax.lax.scan(
            body, (s0, s1, out, jnp.asarray(2)), self._bessel[2:]
        )
        return out

    # ---- measure-property protocol ---------------------------------------

    def sample_state(self, session, state, step):
        u, hop, xx, idx = self._build_h(state)
        n = u.shape[0]  # orbital count
        n_atoms = n // (4 if self.model == "sp3" else 1)
        rng = np.random.default_rng(self.seed)
        phase = rng.random(n) * 2.0 * np.pi

        dos_fn = jax.jit(
            lambda sl, sr: self._summation(self._moments(sl, sr, u, hop, idx))
        )
        s = jnp.asarray(np.exp(1j * phase))
        dos = np.asarray(dos_fn(s, s))
        with open(os.path.join(session.workdir, "lsqt_dos.out"), "a") as f:
            # states/eV/ATOM (ref: lsqt.cu:817)
            f.write("".join(f"{v / n_atoms:25.15e}" for v in dos) + "\n")

        # velocity: <s J+ | J s> correlation at t = 0
        js = jax.jit(lambda ss: self._j_apply(ss, hop, xx, idx))(s)
        vel = np.asarray(dos_fn(js, js))
        # A*eV/hbar -> m/s (ref: lsqt.cu:852)
        m_per_s = 1.60217663e5 / 1.054571817
        with open(os.path.join(session.workdir, "lsqt_velocity.out"), "a") as f:
            row = np.sqrt(np.maximum(vel, 0.0) / np.maximum(dos, 1e-30)) * m_per_s
            f.write("".join(f"{v:25.15e}" for v in row) + "\n")

        # sigma(E, t): evolve both states, correlate with J
        if self._sl is None:
            self._sl = s
            self._sr = js
        else:
            ev = jax.jit(
                lambda ss: self._evolve(ss, u, hop, idx, -1.0)
            )
            self._sl = ev(self._sl)
            self._sr = ev(self._sr)
        sc = jax.jit(lambda ss: self._j_apply(ss, hop, xx, idx))(self._sl)
        vac = np.asarray(dos_fn(sc, self._sr))
        self._sigma += vac * self.dt_hbar / float(state.box.volume)
        s_per_m = 7.748091729e5 * np.pi
        with open(os.path.join(session.workdir, "lsqt_sigma.out"), "a") as f:
            f.write("".join(f"{v * s_per_m:25.15e}" for v in self._sigma) + "\n")

    def postprocess(self, session):
        pass
