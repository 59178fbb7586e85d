"""Shared potential machinery: partial forces -> forces / per-atom virial.

The reference's many-body reducer (ref: src/force/potential.cu:73-113,
`find_properties_many_body`) turns per-pair partial forces f12 into per-atom
force (f12 - f21) and Fan2015 per-atom virial r12 (x) f21, using an
atomics-free gather that searches each neighbor's list for the reverse pair.

TPU-native redesign: the per-pair partial force p_ij = dE/dr12_ij is obtained
by ONE reverse-mode sweep through the (pure) energy function — no analytic
gradient code — and the reduction is a deterministic segment-sum scatter:

    F_k  = sum_j p_kj  -  scatter_add(p, idx)        (exactly -dE/dx_k)
    W_b += (-r12_ab) (x) p_ab   scattered over b     (Fan2015 convention)

Because energies are smooth functions that vanish at the cutoff, padded
neighbor slots (parked at distance 1e5) contribute exactly zero to both the
energy and its gradient.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gpumd_tpu.neighbor.neighbor import NeighborList


class PotentialOutput(NamedTuple):
    energy: jnp.ndarray  # (N,) per-atom potential energy, eV
    force: jnp.ndarray  # (N, 3) eV/A
    virial: jnp.ndarray  # (N, 3, 3) eV, Fan2015 per-atom convention


def forces_virial_from_partials(p, nbr: NeighborList):
    """Reduce per-pair partial forces p_ij = dE/dr12_ij (r12 = r_j - r_i)
    to per-atom force and virial.

    Two paths:
      * gather (nbr.rev present): F_i = sum_m (p[i,m] - p[rev[i,m]]),
        W_i = sum_m r12[i,m] (x) p[rev[i,m]] — the reference's atomics-free
        formulation (potential.cu:73-113), fast on TPU.
      * scatter fallback: segment-sum over neighbor indices.

    Args:
      p: (N, MN, 3) partial forces.
      nbr: the neighbor list that produced the pairs.
    Returns:
      force (N, 3), virial (N, 3, 3).
    """
    from gpumd_tpu.neighbor.neighbor import gather_vec3

    n, mn = p.shape[0], p.shape[1]
    if nbr.rev is not None:
        p_rev = gather_vec3(p.reshape(-1, 3), nbr.rev)
        p_rev = p_rev * nbr.mask[..., None]
        force = jnp.sum(p - p_rev, axis=1)
        # Fan2015: W_i = sum_j r12_ij (x) p_ji
        virial = jnp.einsum("nma,nmb->nab", nbr.r12 * nbr.mask[..., None], p_rev)
        return force, virial

    flat_idx = nbr.idx.reshape(-1)
    flat_p = p.reshape(-1, 3)
    own = jnp.sum(p, axis=1)  # sum_j p_ij
    recv = jax.ops.segment_sum(flat_p, flat_idx, num_segments=n)
    force = own - recv

    # W_b = sum over pairs (a -> b) of (-r12_ab) (x) p_ab
    w_pair = -nbr.r12[..., :, None] * p[..., None, :]  # (N, MN, 3, 3)
    # Padded slots have p == 0 (smooth cutoff) but r12 == 1e5; guard anyway.
    w_pair = w_pair * nbr.mask[..., None, None]
    virial = jax.ops.segment_sum(
        w_pair.reshape(-1, 3, 3), flat_idx, num_segments=n
    )
    return force, virial


def compute_from_pair_energy(
    energy_fn: Callable[[jnp.ndarray], jnp.ndarray],
    nbr: NeighborList,
    mask: jnp.ndarray,
    per_atom_virial: bool = True,
) -> PotentialOutput:
    """Full potential evaluation from a per-atom energy function of r12.

    Args:
      energy_fn: maps r12 (N, MN, 3) -> per-atom energies (N,).  Must be
        smooth and exactly zero-gradient beyond the cutoff.
      nbr: neighbor list.
      mask: (N,) real-atom mask.
      per_atom_virial: when False, only the TOTAL virial is computed (a
        cheap reduction instead of a (N, MN, 3, 3) scatter) and spread
        uniformly over real atoms so pressure/thermo stay exact.  Per-atom
        heat-current observables require True.
    """
    e_atom, vjp = jax.vjp(energy_fn, nbr.r12)
    e_atom = e_atom * mask
    (p,) = vjp(mask.astype(e_atom.dtype))
    if per_atom_virial or nbr.rev is not None:
        # With a reverse map the per-atom virial is a cheap gather; always
        # compute it in that case.
        force, virial = forces_virial_from_partials(p, nbr)
    else:
        n = p.shape[0]
        flat_idx = nbr.idx.reshape(-1)
        own = jnp.sum(p, axis=1)
        recv = jax.ops.segment_sum(p.reshape(-1, 3), flat_idx, num_segments=n)
        force = own - recv
        w_total = -jnp.einsum("pma,pmb->ab", nbr.r12 * nbr.mask[..., None], p)
        n_real = jnp.maximum(jnp.sum(mask), 1.0)
        virial = (w_total / n_real) * mask[:, None, None]
    return PotentialOutput(energy=e_atom, force=force, virial=virial)
