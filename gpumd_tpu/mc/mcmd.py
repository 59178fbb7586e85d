"""Hybrid MCMD: Monte Carlo type moves interleaved with MD.

run.in: `mc canonical num_steps_md num_steps_mc T_initial T_final`
        `mc sgc   ... num_types (sym mu)...`
        `mc vcsgc ... num_types (sym phi)... kappa`
(ref: src/mc/mc.cu:206-330, mc_ensemble_canonical.cu, mc_ensemble_sgc.cu)

Canonical: pick two atoms of different types and propose an identity swap
(type + mass + velocity, ref: exchange kernel mc_ensemble_canonical.cu:177).
SGC: pick one atom and propose a species flip with chemical-potential bias
dE += mu_new - mu_old; VC-SGC adds the variance constraint
kappa kB T / N (N (phi_new - phi_old) + 2 (N_new - N_old) + 1)
(ref: mc_ensemble_sgc.cu:465-471); the flipped atom's velocity is scaled by
m_old/m_new for momentum conservation (gpu_flip).

Energy differences are LOCAL: only atoms within the cutoff of the touched
sites change energy, so trials evaluate the NEP per-atom energy on the
bounded cluster {i, j} + their neighbor rows — the TPU analog of the
reference's dedicated evaluator over the i/j neighborhood
(ref: nep_energy.cu:483-530, mc_ensemble_canonical.cu:248-330).  Positions
are frozen during a trial block, so ONE neighbor build serves all trials
and each trial costs O(cluster * MN) instead of O(N * MN).  Potentials
without a per-atom-energy hook fall back to the exact global difference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.units import K_B

_MAX_REDRAW = 64  # bounded redraw of invalid picks (jit-safe while_loop)


def _redraw(key, n_real, bad_fn, first):
    """Redraw a uniform index until not bad_fn(i) (bounded)."""

    def cond(c):
        i, tries, _ = c
        return bad_fn(i) & (tries < _MAX_REDRAW)

    def body(c):
        _, tries, kk = c
        kk, sub = jax.random.split(kk)
        return jax.random.randint(sub, (), 0, n_real), tries + 1, kk

    i, _, _ = jax.lax.while_loop(cond, body, (first, 0, key))
    return i


@dataclass(frozen=True)
class MCMD:
    kind: str  # canonical | sgc | vcsgc
    num_steps_md: int
    num_steps_mc: int
    t_initial: float
    t_final: float
    # sgc/vcsgc: species type indices, chemical potentials (phi), masses
    sgc_types: Tuple[int, ...] = ()
    sgc_mu: Tuple[float, ...] = ()
    sgc_masses: Tuple[float, ...] = ()
    kappa: float = 0.0
    seed: int = 2024

    def make_trials(self, ff: ForceField):
        """Returns jitted (state, key, temperature) -> (state, key,
        n_accepted)."""
        pots = ff.potentials
        local = len(pots) == 1 and hasattr(pots[0], "per_atom_energy")
        if local:
            return self._make_local_trials(ff, pots[0])
        return self._make_global_trials(ff)

    # ---- local cluster ΔE (NEP fast path) --------------------------------

    def _make_local_trials(self, ff: ForceField, pot):
        nmc = self.num_steps_mc
        kind = self.kind

        def run_trials(state, key, t):
            pos = state.box.wrap(state.position)
            nbr = ff.neighbor.build(pos, state.box, state.mask)
            n = state.type.shape[0]
            n_real = jnp.sum(state.mask).astype(jnp.int32)
            kt = K_B * t

            def cluster_of(rows_idx, rows_mask, extra):
                """Sorted-unique affected set: `extra` sites + their
                neighbor rows; returns (cl, clmask)."""
                cand = jnp.concatenate(
                    [jnp.asarray(extra, jnp.int32).reshape(-1)]
                    + [r.reshape(-1) for r in rows_idx]
                )
                ok = jnp.concatenate(
                    [jnp.ones((len(extra),), rows_mask[0].dtype)]
                    + [m.reshape(-1) for m in rows_mask]
                )
                cand = jnp.where(ok > 0, cand, n)
                cand = jnp.sort(cand)
                uniq = jnp.concatenate(
                    [jnp.asarray([True]), cand[1:] != cand[:-1]]
                ) & (cand < n)
                return jnp.minimum(cand, n - 1), uniq.astype(pos.dtype)

            def de_of(types_old, types_new, cl, clmask):
                r12 = nbr.r12[cl]
                idxc = nbr.idx[cl]
                k = cl.shape[0]

                def e_of(types):
                    e = pot.per_atom_energy(
                        r12, types[cl], types[idxc], block=k
                    )
                    return jnp.sum(e * clmask)

                return e_of(types_new) - e_of(types_old)

            if kind == "canonical":

                def trial(carry, _):
                    types, mass, vel, key, na = carry
                    key, k1, k2, k3, k4 = jax.random.split(key, 5)
                    i = jax.random.randint(k1, (), 0, n_real)
                    ti = types[i]
                    j = _redraw(
                        k3, n_real, lambda j: types[j] == ti,
                        jax.random.randint(k2, (), 0, n_real),
                    )
                    tj = types[j]
                    cl, clmask = cluster_of(
                        [nbr.idx[i], nbr.idx[j]],
                        [nbr.mask[i], nbr.mask[j]],
                        [i, j],
                    )
                    new_types = types.at[i].set(tj).at[j].set(ti)
                    de = de_of(types, new_types, cl, clmask)
                    accept = (ti != tj) & (
                        jax.random.uniform(k4, (), de.dtype)
                        < jnp.exp(-de / kt)
                    )
                    # identity swap: type + mass + velocity ride together
                    def swap(a):
                        ai, aj = a[i], a[j]
                        return a.at[i].set(aj).at[j].set(ai)

                    types = jnp.where(accept, new_types, types)
                    mass = jnp.where(accept, swap(mass), mass)
                    vel = jnp.where(accept, swap(vel), vel)
                    return (types, mass, vel, key, na + accept.astype(jnp.int32)), 0

                (types, mass, vel, key, na), _ = jax.lax.scan(
                    trial,
                    (state.type, state.mass, state.velocity, key,
                     jnp.zeros((), jnp.int32)),
                    length=nmc,
                )
                return state._replace(type=types, mass=mass, velocity=vel), key, na

            # sgc / vcsgc
            types_arr = jnp.asarray(self.sgc_types, jnp.int32)
            mu_arr = jnp.asarray(self.sgc_mu, pos.dtype)
            mass_arr = jnp.asarray(self.sgc_masses, pos.dtype)
            ns = len(self.sgc_types)
            vcs = kind == "vcsgc"

            def species_counts(types, mask):
                return jnp.asarray(
                    [jnp.sum((types == tt) * (mask > 0)) for tt in self.sgc_types],
                    jnp.int32,
                )

            def trial(carry, _):
                types, mass, vel, key, na, nsp = carry
                key, k1, k2, k3, k4 = jax.random.split(key, 5)
                in_list = lambda tt: jnp.any(types_arr == tt)
                i = _redraw(
                    k2, n_real, lambda i_: ~in_list(types[i_]),
                    jax.random.randint(k1, (), 0, n_real),
                )
                ti = types[i]
                old = jnp.argmax(types_arr == ti)

                def pick_cond(c):
                    p, tries, _ = c
                    return (types_arr[p] == ti) & (tries < _MAX_REDRAW)

                def pick_body(c):
                    _, tries, kk = c
                    kk, sub = jax.random.split(kk)
                    return jax.random.randint(sub, (), 0, ns), tries + 1, kk

                new, _, _ = jax.lax.while_loop(
                    pick_cond, pick_body,
                    (jax.random.randint(k3, (), 0, ns), 0, key),
                )
                tnew = types_arr[new]
                cl, clmask = cluster_of([nbr.idx[i]], [nbr.mask[i]], [i])
                new_types = types.at[i].set(tnew)
                de = de_of(types, new_types, cl, clmask)
                if vcs:
                    nr = n_real.astype(de.dtype)
                    de = de + self.kappa * kt / nr * (
                        nr * (mu_arr[new] - mu_arr[old])
                        + 2.0 * (nsp[new] - nsp[old]).astype(de.dtype)
                        + 1.0
                    )
                else:
                    de = de + mu_arr[new] - mu_arr[old]
                accept = (tnew != ti) & (
                    jax.random.uniform(k4, (), de.dtype) < jnp.exp(-de / kt)
                )
                m_old, m_new = mass[i], mass_arr[new]
                types = jnp.where(accept, new_types, types)
                mass = jnp.where(accept, mass.at[i].set(m_new), mass)
                # v *= m_old/m_new: momentum conservation (gpu_flip)
                vel = jnp.where(
                    accept, vel.at[i].multiply(m_old / m_new), vel
                )
                dn = jnp.zeros((ns,), jnp.int32).at[new].add(1).at[old].add(-1)
                nsp = jnp.where(accept, nsp + dn, nsp)
                return (types, mass, vel, key, na + accept.astype(jnp.int32), nsp), 0

            nsp0 = species_counts(state.type, state.mask)
            (types, mass, vel, key, na, _), _ = jax.lax.scan(
                trial,
                (state.type, state.mass, state.velocity, key,
                 jnp.zeros((), jnp.int32), nsp0),
                length=nmc,
            )
            return state._replace(type=types, mass=mass, velocity=vel), key, na

        return jax.jit(run_trials)

    # ---- global ΔE fallback (non-NEP potentials) -------------------------

    def _make_global_trials(self, ff: ForceField):
        nmc = self.num_steps_mc
        kind = self.kind

        def total_energy(state):
            out = ff.compute(state)
            return jnp.sum(out.potential_energy * out.mask)

        if kind == "canonical":

            def trial(carry, _):
                state, key, t, na = carry
                key, k1, k2, k3, k4 = jax.random.split(key, 5)
                n_real = jnp.sum(state.mask).astype(jnp.int32)
                i = jax.random.randint(k1, (), 0, n_real)
                ti = state.type[i]
                j = _redraw(
                    k3, n_real, lambda j_: state.type[j_] == ti,
                    jax.random.randint(k2, (), 0, n_real),
                )
                tj = state.type[j]
                e0 = total_energy(state)

                def swap(a):
                    ai, aj = a[i], a[j]
                    return a.at[i].set(aj).at[j].set(ai)

                cand = state._replace(
                    type=swap(state.type), mass=swap(state.mass),
                    velocity=swap(state.velocity),
                )
                de = total_energy(cand) - e0
                accept = (ti != tj) & (
                    jax.random.uniform(k4, (), de.dtype)
                    < jnp.exp(-de / (K_B * t))
                )
                state = jax.tree.map(
                    lambda a, b: jnp.where(accept, a, b), cand, state
                )
                return (state, key, t, na + accept.astype(jnp.int32)), 0

            def run_trials(state, key, t):
                (state, key, _, na), _ = jax.lax.scan(
                    trial, (state, key, t, jnp.zeros((), jnp.int32)),
                    length=nmc,
                )
                return state, key, na

            return jax.jit(run_trials)

        types_arr = jnp.asarray(self.sgc_types, jnp.int32)
        mu_arr = jnp.asarray(self.sgc_mu)
        mass_arr = jnp.asarray(self.sgc_masses)
        ns = len(self.sgc_types)
        vcs = kind == "vcsgc"

        def trial(carry, _):
            state, key, t, na, nsp = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            n_real = jnp.sum(state.mask).astype(jnp.int32)
            in_list = lambda tt: jnp.any(types_arr == tt)
            i = _redraw(
                k2, n_real, lambda i_: ~in_list(state.type[i_]),
                jax.random.randint(k1, (), 0, n_real),
            )
            ti = state.type[i]
            old = jnp.argmax(types_arr == ti)
            new0 = jax.random.randint(k3, (), 0, ns)

            def pick_cond(c):
                p, tries, _ = c
                return (types_arr[p] == ti) & (tries < _MAX_REDRAW)

            def pick_body(c):
                _, tries, kk = c
                kk, sub = jax.random.split(kk)
                return jax.random.randint(sub, (), 0, ns), tries + 1, kk

            new, _, _ = jax.lax.while_loop(pick_cond, pick_body, (new0, 0, key))
            tnew = types_arr[new]
            e0 = total_energy(state)
            m_old, m_new = state.mass[i], mass_arr[new]
            cand = state._replace(
                type=state.type.at[i].set(tnew),
                mass=state.mass.at[i].set(m_new),
                velocity=state.velocity.at[i].multiply(m_old / m_new),
            )
            de = total_energy(cand) - e0
            if vcs:
                nr = n_real.astype(de.dtype)
                de = de + self.kappa * K_B * t / nr * (
                    nr * (mu_arr[new] - mu_arr[old])
                    + 2.0 * (nsp[new] - nsp[old]).astype(de.dtype)
                    + 1.0
                )
            else:
                de = de + mu_arr[new] - mu_arr[old]
            accept = (tnew != ti) & (
                jax.random.uniform(k4, (), de.dtype)
                < jnp.exp(-de / (K_B * t))
            )
            state = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), cand, state
            )
            dn = jnp.zeros((ns,), jnp.int32).at[new].add(1).at[old].add(-1)
            nsp = jnp.where(accept, nsp + dn, nsp)
            return (state, key, t, na + accept.astype(jnp.int32), nsp), 0

        def run_trials(state, key, t):
            nsp0 = jnp.asarray(
                [jnp.sum((state.type == tt) * (state.mask > 0))
                 for tt in self.sgc_types],
                jnp.int32,
            )
            (state, key, _, na, _), _ = jax.lax.scan(
                trial, (state, key, t, jnp.zeros((), jnp.int32), nsp0),
                length=nmc,
            )
            return state, key, na

        return jax.jit(run_trials)
