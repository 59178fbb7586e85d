"""Force-constant potential (FCP), orders 2-6.

TPU-native rebuild of the reference FCP (ref: src/force/fcp.cu:25-1130):
the Taylor-expansion energy in displacements u = x - r0

  E = sum_c2 1/2  u_i^a phi2_ab u_j^b
    + sum_c3 1/6  phi3_abc u_i^a u_j^b u_k^c
    + sum_cK w_c  phiK u_i u_j ... (orders 4-6, ordered clusters with
                                    multiplicity weights 1/m!)

is assembled as ONE differentiable scalar over gathered cluster
displacements (pure tensor contractions — ideal MXU/VPU work), and forces
come from jax.grad instead of the reference's per-order atomicAdd kernels.
Per-atom energies and the (heat-current) virial follow the reference's
attribution: energy and virial land on each cluster's FIRST atom, with
W_i[r, a] += 0.5 r0_ij,r * dE_cluster/du_i,a (ref: gpu_find_force_fcp2/3
x/y/z slot maps).  The net force is explicitly zero-summed by the driver
(ref: force.cu:610-631 always zero-sums FCP forces).

Input files (ref: fcp.cu read_* — formats preserved):
  potential file: "fcp num_types syms..." + "order heat_order" + path
  <path>/r0.in                 N lines "x y z" equilibrium positions
  <path>/fcs_orderK.in         num_fcs, then 3^K lines "a b [c..] phi"
  <path>/clusters_orderK.in    numK, then lines "i j [k..] index"
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box
from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import PotentialOutput


class FCPOrder(NamedTuple):
    atoms: jnp.ndarray  # (C, K) int32 cluster atom indices
    index: jnp.ndarray  # (C,) int32 phi row
    phi: jnp.ndarray  # (num_fcs, 3, 3, ..., 3) K-dim
    weight: Optional[jnp.ndarray] = None  # (C,) orders >= 4
    rij_half: Optional[jnp.ndarray] = None  # (C, 3) orders 2-3 virial


class FCP(NamedTuple):
    order: int
    heat_order: int
    r0: jnp.ndarray  # (N, 3)
    orders: tuple  # FCPOrder per active order (2..order)
    rc: float = 0.0  # no neighbor list needed

    @staticmethod
    def from_file(path: str, workdir: str = ".") -> "FCP":
        import os

        with open(path) as f:
            toks = f.read().split()
        assert toks[0] == "fcp"
        num_types = int(toks[1])
        p = 2 + num_types  # skip symbols
        order = int(toks[p])
        heat_order = int(toks[p + 1])
        if heat_order not in (2, 3):
            raise ValueError("heat current order should be 2 or 3")
        fdir = toks[p + 2]
        if not os.path.isabs(fdir):
            fdir = os.path.join(workdir, fdir)

        r0 = np.loadtxt(os.path.join(fdir, "r0.in"))
        n = len(r0)

        def read_order(k):
            fc = open(os.path.join(fdir, f"fcs_order{k}.in")).read().split()
            num_fcs = int(fc[0])
            rows = 3**k
            vals = np.zeros((num_fcs, rows))
            pos_ = 1
            for m in range(num_fcs):
                for r in range(rows):
                    # k index ints then the value
                    vals[m, r] = float(fc[pos_ + k])
                    pos_ += k + 1
            phi = vals.reshape((num_fcs,) + (3,) * k)
            cl = open(
                os.path.join(fdir, f"clusters_order{k}.in")
            ).read().split()
            num_cl = int(cl[0])
            arr = np.asarray(cl[1:], dtype=np.int64).reshape(num_cl, k + 1)
            atoms = arr[:, :k]
            index = arr[:, k]
            if (atoms >= n).any() or (atoms < 0).any():
                raise ValueError(f"clusters_order{k}.in: atom out of range")
            weight = None
            rij_half = None
            if k >= 4:
                # multiplicity weight 1/prod(group sizes!) over equal runs
                # (ref: fcp.cu:345-364 and the order-5/6 analogs)
                import math

                weight = np.ones(num_cl)
                for c in range(num_cl):
                    runs = []
                    run = 1
                    for t in range(1, k):
                        if atoms[c, t] == atoms[c, t - 1]:
                            run += 1
                        else:
                            runs.append(run)
                            run = 1
                    runs.append(run)
                    for r in runs:
                        weight[c] /= math.factorial(r)
            return atoms, index, phi, weight

        orders = []
        box_stub = None
        for k in range(2, order + 1):
            atoms, index, phi, weight = read_order(k)
            orders.append(
                FCPOrder(
                    atoms=jnp.asarray(atoms, jnp.int32),
                    index=jnp.asarray(index, jnp.int32),
                    phi=jnp.asarray(phi, jnp.float32),
                    weight=(jnp.asarray(weight, jnp.float32)
                            if weight is not None else None),
                    rij_half=None,  # filled in attach_box
                )
            )
        return FCP(order=order, heat_order=heat_order,
                   r0=jnp.asarray(r0), orders=tuple(orders))

    def attach_box(self, box: Box) -> "FCP":
        """Precompute MIC half-bond vectors for the order-2/3 virial
        (ref: fcp.cu:158-166, 240-248)."""
        new_orders = []
        for k_i, od in enumerate(self.orders):
            k = k_i + 2
            if k <= 3:
                rij = self.r0[od.atoms[:, 1]] - self.r0[od.atoms[:, 0]]
                rij = box.minimum_image(rij)
                od = od._replace(rij_half=0.5 * rij)
            new_orders.append(od)
        return self._replace(orders=tuple(new_orders))

    # ---- evaluation -------------------------------------------------------

    def _cluster_energies(self, u, od: FCPOrder, k: int):
        """Per-cluster energy + dE/du_first (C, 3) for virial."""
        dtype = u.dtype
        phi = od.phi.astype(dtype)[od.index]  # (C, 3^k tensor)
        us = [u[od.atoms[:, t]] for t in range(k)]  # k x (C, 3)
        if k == 2:
            g = jnp.einsum("cab,cb->ca", phi, us[1])
            e = 0.5 * jnp.einsum("ca,ca->c", us[0], g)
            de_first = g  # d(phi u0 u1)/du0 (x prefactor handled below)
            pref = 0.5
        elif k == 3:
            g = jnp.einsum("cabc,cb,cc->ca", phi, us[1], us[2])
            e = jnp.einsum("ca,ca->c", us[0], g) / 6.0
            de_first = 0.5 * g  # reference: -0.5 phi ujb ukc at i
            pref = None
        else:
            # contract phi with u_1..u_{k-1}, leaving the first slot
            g = phi
            for t in range(k - 1, 0, -1):
                g = jnp.einsum("c...a,ca->c...", g, us[t])
            e = od.weight.astype(dtype) * jnp.einsum("ca,ca->c", us[0], g)
            de_first = None
            pref = None
        return e, de_first

    def energy_fn(self, positions, mask):
        """Total energy + per-atom energies (reference attribution)."""
        u = (positions - self.r0.astype(positions.dtype)) * mask[:, None]
        n = positions.shape[0]
        e_atom = jnp.zeros((n,), positions.dtype)
        for k_i, od in enumerate(self.orders):
            k = k_i + 2
            e_c, _ = self._cluster_energies(u, od, k)
            e_atom = e_atom + jax.ops.segment_sum(
                e_c, od.atoms[:, 0], num_segments=n
            )
        return jnp.sum(e_atom), e_atom

    def compute_with_state(self, state, nbr: NeighborList) -> PotentialOutput:
        positions = state.position
        mask = state.mask
        n = positions.shape[0]

        (e_tot, e_atom), dpos = jax.value_and_grad(
            self.energy_fn, has_aux=True
        )(positions, mask)
        force = -dpos * mask[:, None]
        # FCP always zero-sums the net force (ref: force.cu:610-631)
        n_real = jnp.maximum(jnp.sum(mask), 1.0)
        force = (force - jnp.sum(force, axis=0) / n_real) * mask[:, None]

        # virial for the heat current: orders 2..heat_order only
        u = (positions - self.r0.astype(positions.dtype)) * mask[:, None]
        w = jnp.zeros((n, 3, 3), positions.dtype)
        for k_i, od in enumerate(self.orders):
            k = k_i + 2
            if k > self.heat_order or k > 3:
                continue
            _, de_first = self._cluster_energies(u, od, k)
            # W_i[r, a] += 0.5 r0_ij,r * (phi... )_a  (ref slot maps)
            wc = od.rij_half.astype(u.dtype)[:, :, None] * de_first[:, None, :]
            w = w + jax.ops.segment_sum(wc, od.atoms[:, 0], num_segments=n)
        return PotentialOutput(energy=e_atom, force=force, virial=w)
