"""EAM potentials: Zhou 2004 analytic (1+ elements) and Dai 2006 (F-S).

File formats (ref: src/force/eam.cu:28-128):
    eam_zhou_2004 <T> <syms>   then 21 numbers per type:
        re fe rho_e rho_s alpha beta A B kappa lambda
        Fn0 Fn1 Fn2 Fn3 F0 F1 F2 F3 eta Fe rc
    eam_dai_2006 1 <sym>       then 9 numbers: A d c c0 c1 c2 c3 c4 B

Zhou 2004 (ref: eam.cu:131-233):
    phi_tt(r) = A e^{-alpha(r/re-1)}/(1+(r/re-kappa)^20) / 2 * 2 ...
    (the reference stores phi pre-halved; here phi is the full pair energy
    and the per-atom sum takes phi/2 per ordered pair)
    cross pair: phi_ab = (phi_a f_b / f_a + phi_b f_a / f_b) / 2
    rho_i = sum_j f_{t_j}(r_ij);  E_i = F_{t_i}(rho_i) + sum_j phi/2
    F: 3 branches (cubic below 0.85 rho_e, cubic to 1.15 rho_e, then
    Fe (1 - eta ln x) x^eta).

Forces/virials by autodiff (the embedding chain rule the reference
hand-codes in two passes comes for free).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput, compute_from_pair_energy


class EAMZhou2004(NamedTuple):
    # all (T,) arrays
    re: jnp.ndarray
    fe: jnp.ndarray
    rho_e: jnp.ndarray
    rho_s: jnp.ndarray
    alpha: jnp.ndarray
    beta: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    kappa: jnp.ndarray
    lam: jnp.ndarray
    fn: jnp.ndarray  # (T, 4) Fn0..Fn3
    f03: jnp.ndarray  # (T, 4) F0..F3
    eta: jnp.ndarray
    fe_emb: jnp.ndarray  # Fe (embedding prefactor)
    rc_t: jnp.ndarray
    rc: float

    @staticmethod
    def from_file(path: str) -> "EAMZhou2004":
        with open(path) as f:
            tokens = f.read().split()
        if tokens[0] != "eam_zhou_2004":
            raise ValueError(f"{path}: not an eam_zhou_2004 file")
        t = int(tokens[1])
        vals = np.array([float(x) for x in tokens[2 + t :]]).reshape(t, 21)
        return EAMZhou2004(
            re=jnp.asarray(vals[:, 0]),
            fe=jnp.asarray(vals[:, 1]),
            rho_e=jnp.asarray(vals[:, 2]),
            rho_s=jnp.asarray(vals[:, 3]),
            alpha=jnp.asarray(vals[:, 4]),
            beta=jnp.asarray(vals[:, 5]),
            a=jnp.asarray(vals[:, 6]),
            b=jnp.asarray(vals[:, 7]),
            kappa=jnp.asarray(vals[:, 8]),
            lam=jnp.asarray(vals[:, 9]),
            fn=jnp.asarray(vals[:, 10:14]),
            f03=jnp.asarray(vals[:, 14:18]),
            eta=jnp.asarray(vals[:, 18]),
            fe_emb=jnp.asarray(vals[:, 19]),
            rc_t=jnp.asarray(vals[:, 20]),
            rc=float(vals[:, 20].max()),
        )

    # ---- functional forms -----------------------------------------------------

    def _pow20(self, x):
        x2 = x * x
        x4 = x2 * x2
        return x4 * x4 * x4 * x4 * x4

    def _phi_single(self, t_arr, d, dtype):
        """Same-type pair function phi_t(r) for per-pair type array t_arr."""
        re = self.re[t_arr].astype(dtype)
        rr = d / re
        t1 = self._pow20(rr - self.kappa[t_arr].astype(dtype))
        t2 = self._pow20(rr - self.lam[t_arr].astype(dtype))
        phi1 = (
            self.a[t_arr].astype(dtype)
            * jnp.exp(-self.alpha[t_arr].astype(dtype) * (rr - 1.0))
            / (1.0 + t1)
        )
        phi2 = (
            self.b[t_arr].astype(dtype)
            * jnp.exp(-self.beta[t_arr].astype(dtype) * (rr - 1.0))
            / (1.0 + t2)
        )
        return phi1 - phi2

    def _f_single(self, t_arr, d, dtype):
        re = self.re[t_arr].astype(dtype)
        rr = d / re
        t2 = self._pow20(rr - self.lam[t_arr].astype(dtype))
        return (
            self.fe[t_arr].astype(dtype)
            * jnp.exp(-self.beta[t_arr].astype(dtype) * (rr - 1.0))
            / (1.0 + t2)
        )

    def _embed(self, t1, rho, dtype):
        rho_e = self.rho_e[t1].astype(dtype)
        rho_s = self.rho_s[t1].astype(dtype)
        rho_n = rho_e * 0.85
        rho_0 = rho_e * 1.15
        fn = self.fn[t1].astype(dtype)
        f03 = self.f03[t1].astype(dtype)
        eta = self.eta[t1].astype(dtype)
        fe = self.fe_emb[t1].astype(dtype)

        xn = rho / rho_n - 1.0
        f_lo = ((fn[..., 3] * xn + fn[..., 2]) * xn + fn[..., 1]) * xn + fn[..., 0]
        xe = rho / rho_e - 1.0
        f_mid = ((f03[..., 3] * xe + f03[..., 2]) * xe + f03[..., 1]) * xe + f03[..., 0]
        xs = jnp.maximum(rho / rho_s, 1e-10)
        x_eta = xs**eta
        f_hi = fe * (1.0 - eta * jnp.log(xs)) * x_eta
        return jnp.where(
            rho < rho_n, f_lo, jnp.where(rho < rho_0, f_mid, f_hi)
        )

    def pair_energies(self, r12, t1, t2):
        dtype = r12.dtype
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
        in_rc = d < self.rc
        d = jnp.minimum(d, self.rc)  # keep pow/exp tame on padded slots

        # density
        f_j = self._f_single(t2, d, dtype) * in_rc
        rho = jnp.sum(f_j, axis=-1)

        # pair term with Zhou cross mixing
        t1b = jnp.broadcast_to(t1[:, None], t2.shape)
        phi_11 = self._phi_single(t1b, d, dtype)
        same = t1b == t2
        phi_22 = self._phi_single(t2, d, dtype)
        f_1 = self._f_single(t1b, d, dtype)
        f_2 = f_j  # = f of type2 (masked later)
        f_2u = self._f_single(t2, d, dtype)
        cross = 0.5 * (
            phi_11 * f_2u / jnp.maximum(f_1, 1e-30)
            + phi_22 * f_1 / jnp.maximum(f_2u, 1e-30)
        )
        phi = jnp.where(same, phi_11, cross) * in_rc

        return self._embed(t1, rho, dtype) + 0.5 * jnp.sum(phi, axis=-1)

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )


def _hermite_coeffs(y: np.ndarray) -> np.ndarray:
    """LAMMPS-style cubic Hermite spline coefficients per knot interval
    (ref: eam_alloy.cu:29-70): derivatives from centered differences.
    Returns (n, 4) [a, b, c, d] with f(i+t) = a + b t + c t^2 + d t^3."""
    n = len(y)
    d = np.zeros(n)
    d[1:-1] = 0.5 * (y[2:] - y[:-2])
    d[0] = y[1] - y[0]
    d[-1] = y[-1] - y[-2]
    a = y[:-1]
    b = d[:-1]
    c = 3.0 * (y[1:] - y[:-1]) - 2.0 * d[:-1] - d[1:]
    e = -2.0 * (y[1:] - y[:-1]) + d[:-1] + d[1:]
    coef = np.stack([a, b, c, e], axis=1)
    return np.concatenate([coef, coef[-1:]], axis=0)  # pad last knot


def _spline_eval(coef, x, h):
    """Evaluate a Hermite spline table.

    coef: (..., n, 4) batched per evaluation point (leading dims match x);
    x: (...,) in physical units.
    """
    n = coef.shape[-2]
    t = x / h
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    dt = t - i.astype(t.dtype)
    c = jnp.take_along_axis(coef, i[..., None, None], axis=-2)[..., 0, :]
    return c[..., 0] + dt * (c[..., 1] + dt * (c[..., 2] + dt * c[..., 3]))


class EAMAlloy(NamedTuple):
    """Tabulated eam/alloy (setfl) potential with cubic Hermite splines
    (ref: src/force/eam_alloy.cu; format: 3 comment lines, `Nelem syms`,
    `nrho drho nr dr cutoff`, per element [Z mass lat struct, F(rho),
    rho(r)], then r*phi(r) for the (i >= j) pair triangle)."""

    f_coef: jnp.ndarray  # (T, nrho, 4) embedding F(rho)
    rho_coef: jnp.ndarray  # (T, nr, 4) density rho(r)
    phi_coef: jnp.ndarray  # (T, T, nr, 4) r*phi(r), symmetric
    drho: float
    dr: float
    rc: float
    symbols: tuple

    @staticmethod
    def from_file(path: str) -> "EAMAlloy":
        with open(path) as f:
            lines = f.readlines()
        # skip 3 comment lines
        words = " ".join(lines[3:]).split()
        i = 0
        t = int(words[i]); i += 1
        symbols = tuple(words[i : i + t]); i += t
        nrho = int(words[i]); drho = float(words[i + 1])
        nr = int(words[i + 2]); dr = float(words[i + 3])
        rc = float(words[i + 4]); i += 5
        f_tab = np.zeros((t, nrho))
        rho_tab = np.zeros((t, nr))
        for e in range(t):
            i += 4  # Z mass lattice structure
            f_tab[e] = [float(w) for w in words[i : i + nrho]]; i += nrho
            rho_tab[e] = [float(w) for w in words[i : i + nr]]; i += nr
        phi_tab = np.zeros((t, t, nr))
        for a in range(t):
            for b in range(a + 1):
                vals = [float(w) for w in words[i : i + nr]]; i += nr
                phi_tab[a, b] = vals
                phi_tab[b, a] = vals
        return EAMAlloy(
            f_coef=jnp.asarray(
                np.stack([_hermite_coeffs(f_tab[e]) for e in range(t)])
            ),
            rho_coef=jnp.asarray(
                np.stack([_hermite_coeffs(rho_tab[e]) for e in range(t)])
            ),
            phi_coef=jnp.asarray(
                np.stack(
                    [
                        np.stack([_hermite_coeffs(phi_tab[a, b]) for b in range(t)])
                        for a in range(t)
                    ]
                )
            ),
            drho=drho, dr=dr, rc=rc, symbols=symbols,
        )

    def pair_energies(self, r12, t1, t2):
        dtype = r12.dtype
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
        in_rc = (d < self.rc).astype(dtype)
        dc = jnp.minimum(d, self.rc)

        # density from neighbors (tables indexed by the NEIGHBOR type)
        rho_c = self.rho_coef.astype(dtype)
        rho_j = _spline_eval(rho_c[t2], dc, self.dr) * in_rc
        rho = jnp.sum(rho_j, axis=-1)

        # embedding
        f_c = self.f_coef.astype(dtype)
        nrho = f_c.shape[1]
        rho_cl = jnp.minimum(rho, (nrho - 1) * self.drho)
        emb = _spline_eval(f_c[t1], rho_cl, self.drho)

        # pair term: tables store r*phi
        phi_c = self.phi_coef.astype(dtype)
        t1b = jnp.broadcast_to(t1[:, None], t2.shape)
        rphi = _spline_eval(phi_c[t1b, t2], dc, self.dr)
        phi = jnp.where(d > 1e-6, rphi / jnp.maximum(d, 1e-6), 0.0) * in_rc
        return emb + 0.5 * jnp.sum(phi, axis=-1)

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )


class ADP(NamedTuple):
    """Angular-dependent potential: EAM + dipole/quadrupole distortion
    terms (Mishin ADP; ref: src/force/adp.cu).

    File: `adp T syms`, comment lines, setfl body (F, rho per element;
    then r*phi, u, w pair tables for the j <= i triangle).

    E_i = F(rho_i) + 1/2 sum phi + 1/2 |mu_i|^2 + 1/2 sum_ab lambda_ab^2
          - nu_i^2 / 6,
    mu_ia = sum_j u(r) r_a,  lambda_iab = sum_j w(r) r_a r_b, nu = tr lambda.
    """

    f_coef: jnp.ndarray  # (T, nrho, 4)
    rho_coef: jnp.ndarray  # (T, nr, 4)
    phi_coef: jnp.ndarray  # (T, T, nr, 4) r*phi
    u_coef: jnp.ndarray  # (T, T, nr, 4)
    w_coef: jnp.ndarray  # (T, T, nr, 4)
    drho: float
    dr: float
    rc: float
    symbols: tuple

    @staticmethod
    def from_file(path: str) -> "ADP":
        with open(path) as f:
            lines = f.readlines()
        head = lines[0].split()
        if head[0] != "adp":
            raise ValueError(f"{path}: not an adp file")
        # "comment n": the header block occupies n lines starting at the
        # `comment` line itself (Ta.adp.txt: `comment 2` + 1 text line).
        idx = 1
        if lines[1].split() and lines[1].split()[0] == "comment":
            n_comments = int(lines[1].split()[1])
            idx = 1 + n_comments
        words = " ".join(lines[idx:]).split()
        i = 0
        t = int(words[i]); i += 1
        symbols = tuple(words[i : i + t]); i += t
        nrho = int(words[i]); drho = float(words[i + 1])
        nr = int(words[i + 2]); dr = float(words[i + 3])
        rc = float(words[i + 4]); i += 5
        f_tab = np.zeros((t, nrho)); rho_tab = np.zeros((t, nr))
        for e in range(t):
            i += 4
            f_tab[e] = [float(w) for w in words[i : i + nrho]]; i += nrho
            rho_tab[e] = [float(w) for w in words[i : i + nr]]; i += nr

        def read_pairs():
            nonlocal i
            tab = np.zeros((t, t, nr))
            for a in range(t):
                for b in range(a + 1):
                    vals = [float(w) for w in words[i : i + nr]]; i += nr
                    tab[a, b] = vals
                    tab[b, a] = vals
            return tab

        phi_tab = read_pairs()
        u_tab = read_pairs()
        w_tab = read_pairs()

        def pair_coeffs(tab):
            return jnp.asarray(
                np.stack(
                    [
                        np.stack([_hermite_coeffs(tab[a, b]) for b in range(t)])
                        for a in range(t)
                    ]
                )
            )

        return ADP(
            f_coef=jnp.asarray(
                np.stack([_hermite_coeffs(f_tab[e]) for e in range(t)])
            ),
            rho_coef=jnp.asarray(
                np.stack([_hermite_coeffs(rho_tab[e]) for e in range(t)])
            ),
            phi_coef=pair_coeffs(phi_tab),
            u_coef=pair_coeffs(u_tab),
            w_coef=pair_coeffs(w_tab),
            drho=drho, dr=dr, rc=rc, symbols=symbols,
        )

    def pair_energies(self, r12, t1, t2):
        dtype = r12.dtype
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
        in_rc = (d < self.rc).astype(dtype)
        dc = jnp.minimum(d, self.rc)
        t1b = jnp.broadcast_to(t1[:, None], t2.shape)

        rho_j = _spline_eval(self.rho_coef.astype(dtype)[t2], dc, self.dr) * in_rc
        rho = jnp.sum(rho_j, axis=-1)
        f_c = self.f_coef.astype(dtype)
        rho_cl = jnp.minimum(rho, (f_c.shape[1] - 1) * self.drho)
        emb = _spline_eval(f_c[t1], rho_cl, self.drho)

        rphi = _spline_eval(self.phi_coef.astype(dtype)[t1b, t2], dc, self.dr)
        phi = jnp.where(d > 1e-6, rphi / jnp.maximum(d, 1e-6), 0.0) * in_rc

        u = _spline_eval(self.u_coef.astype(dtype)[t1b, t2], dc, self.dr) * in_rc
        w = _spline_eval(self.w_coef.astype(dtype)[t1b, t2], dc, self.dr) * in_rc
        r12m = jnp.where(in_rc[..., None] > 0, r12, 0.0)
        mu = jnp.einsum("pm,pma->pa", u, r12m)  # (N, 3)
        lam = jnp.einsum("pm,pma,pmb->pab", w, r12m, r12m)  # (N, 3, 3)
        nu = jnp.trace(lam, axis1=-2, axis2=-1)
        e_ang = (
            0.5 * jnp.sum(mu * mu, axis=-1)
            + 0.5 * jnp.sum(lam * lam, axis=(-2, -1))
            - nu * nu / 6.0
        )
        return emb + 0.5 * jnp.sum(phi, axis=-1) + e_ang

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )


class EAMDai2006(NamedTuple):
    """Finnis-Sinclair-type EAM (Dai 2006), single element
    (ref: eam.cu:97-128, 234-287):
        phi(r) = (r - c)^2 (c0 + c1 r + c2 r^2 + c3 r^3 + c4 r^4), r < c
        f(r)   = (r - d)^2 + B^2 (r - d)^4, r < d
        F(rho) = -A sqrt(rho)
    """

    a: float
    d: float
    c: float
    c0: float
    c1: float
    c2: float
    c3: float
    c4: float
    b: float
    rc: float

    @staticmethod
    def from_file(path: str) -> "EAMDai2006":
        with open(path) as f:
            tokens = f.read().split()
        if tokens[0] != "eam_dai_2006":
            raise ValueError(f"{path}: not an eam_dai_2006 file")
        vals = [float(x) for x in tokens[3:12]]
        a, d, c, c0, c1, c2, c3, c4, b = vals
        return EAMDai2006(
            a=a, d=d, c=c, c0=c0, c1=c1, c2=c2, c3=c3, c4=c4, b=b,
            rc=max(c, d),
        )

    def pair_energies(self, r12, t1, t2):
        dtype = r12.dtype
        dd = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
        dc = jnp.minimum(dd, self.c)
        phi = (dc - self.c) ** 2 * (
            self.c0 + self.c1 * dc + self.c2 * dc**2 + self.c3 * dc**3
            + self.c4 * dc**4
        )
        phi = jnp.where(dd < self.c, phi, 0.0)
        dr = jnp.minimum(dd, self.d)
        f = (dr - self.d) ** 2 + self.b**2 * (dr - self.d) ** 4
        f = jnp.where(dd < self.d, f, 0.0)
        rho = jnp.sum(f, axis=-1)
        emb = -self.a * jnp.sqrt(jnp.maximum(rho, 1e-30))
        emb = jnp.where(rho > 0, emb, 0.0)
        return emb + 0.5 * jnp.sum(phi, axis=-1)

    def compute(self, type_, nbr: NeighborList, mask, per_atom_virial=True) -> PotentialOutput:
        t2 = type_[nbr.idx]
        return compute_from_pair_energy(
            lambda r12: self.pair_energies(r12, type_, t2), nbr, mask,
            per_atom_virial=per_atom_virial,
        )
