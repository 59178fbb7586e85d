"""qNEP: NEP with ANN-predicted charges + Ewald electrostatics.

Reference pipeline (ref: src/force/nep_charge.cu, ewald.cu):
  descriptors -> ANN with two output heads (energy, charge)
  q -= mean(q)                      (charge neutrality, 1346-1348)
  alpha = pi / rc_radial            (344)
  real space (charge_mode 1): within rc_radial,
     E = K_C [ sum_pairs 1/2 q1 q2 erfc(alpha d)/d - alpha/sqrt(pi) q^2 ]
  reciprocal: half-space k enumeration with |k|^2 < (2 pi alpha)^2,
     G_k = 2 (2 pi / V) exp(-k^2/(4 alpha^2)) / k^2,
     E = 1/2 K_C sum_k G_k |S(k)|^2, S(k) = sum q e^{-i k r}
  parameter layout (update_potential, 382-400): per type w0, b0,
     w1 (2*neurons: energy then charge head); sqrt_epsilon_inf; b1; c.

The reference hand-codes the dE/dq chain ("D_real", with the mean-shift
correction 605-634); here the whole thing — charge head, neutrality shift,
real+reciprocal electrostatics — sits inside one differentiated energy
function, so every chain rule is automatic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.model.box import Box
from gpumd_tpu.neighbor.neighbor import NeighborList
from gpumd_tpu.potentials.base import (
    PotentialOutput,
    forces_virial_from_partials,
)
from gpumd_tpu.potentials.nep.model import NEP, _zbl_energy
from gpumd_tpu.potentials.nep.params import NepModel, NepParams, load_nep_txt
from gpumd_tpu.units import K_C, PI


def two_head_energy_charge(model, params, w1_charge, r12, t1, t2):
    """Per-atom (energy_nep, raw charge) from the shared-hidden-layer
    two-head ANN (ref: main_nep/nep_charge.cu apply_ann, outputs = 2).
    Shared by NEPCharge inference and the qNEP trainer forward."""
    nep = NEP(model, params)
    q_desc, d = nep.raw_descriptors(r12, t1, t2)
    q_scaled = q_desc * params.q_scaler.astype(r12.dtype)
    w0 = params.w0.astype(r12.dtype)
    b0 = params.b0.astype(r12.dtype)
    x1 = jnp.tanh(
        jnp.einsum("pd,tud->ptu", q_scaled, w0,
                   preferred_element_type=r12.dtype) - b0[None]
    )
    e_t = jnp.einsum("ptu,tu->pt", x1, params.w1.astype(r12.dtype))
    c_t = jnp.einsum("ptu,tu->pt", x1, w1_charge.astype(r12.dtype))
    e = jnp.take_along_axis(e_t, t1[:, None], axis=1)[:, 0]
    charge = jnp.take_along_axis(c_t, t1[:, None], axis=1)[:, 0]
    e = e - params.b1.astype(r12.dtype)
    if model.zbl:
        e = e + jnp.sum(
            _zbl_energy(d, t1, t2, model, params, r12.dtype), axis=-1
        )
    return e, charge


class NEPCharge(NamedTuple):
    """qNEP potential (charge_mode 1: real-space + k-space electrostatics).

    k-space backend: PPPM mesh solve by default, classical Ewald on demand
    (ref: nep_charge.cuh:179 use_pppm default, run.in `kspace` keyword
    nep_charge.cu:46-75)."""

    model: NepModel
    params: NepParams
    w1_charge: jnp.ndarray  # (T, neurons) charge head
    sqrt_epsilon_inf: jnp.ndarray  # ()
    charge_mode: int
    kspace_method: str = "pppm"
    # static PPPM mesh shape; () = derive from the box (host-side only —
    # set this when calling under jit, e.g. at potential load)
    pppm_mesh: tuple = ()

    @property
    def rc(self) -> float:
        return self.model.rc_radial_max

    @staticmethod
    def from_file(path: str, dtype=None) -> "NEPCharge":
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        with open(path) as f:
            tokens = f.read().split()
        name = tokens[0]
        if "charge" not in name:
            raise ValueError(f"{path}: not a charge NEP model")
        charge_mode = int(name.split("charge")[1][:1])

        # Parse the header exactly like the plain loader by stripping the
        # _chargeX suffix, but stop before parameters.
        from gpumd_tpu.potentials.nep.params import (
            _parse_header_name,
            NepModel,
        )
        from gpumd_tpu.elements import atomic_number

        pos = 0

        def take(k):
            nonlocal pos
            out = tokens[pos : pos + k]
            pos += k
            return out

        take(1)
        version = int(name[3])
        zbl = "_zbl" in name
        num_types = int(take(1)[0])
        symbols = tuple(take(num_types))
        zbl_inner = zbl_outer = 0.0
        if zbl:
            assert take(1)[0] == "zbl"
            zbl_inner, zbl_outer = float(take(1)[0]), float(take(1)[0])
        assert take(1)[0] == "cutoff"
        rest = []
        while tokens[pos] != "n_max":
            rest.append(take(1)[0])
        if len(rest) == 4:
            rc_r = (float(rest[0]),) * num_types
            rc_a = (float(rest[1]),) * num_types
        else:
            rc_r = tuple(float(rest[2 * i]) for i in range(num_types))
            rc_a = tuple(float(rest[2 * i + 1]) for i in range(num_types))
        mn_r, mn_a = int(rest[-2]), int(rest[-1])
        assert take(1)[0] == "n_max"
        n_max_r, n_max_a = int(take(1)[0]), int(take(1)[0])
        assert take(1)[0] == "basis_size"
        basis_r, basis_a = int(take(1)[0]), int(take(1)[0])
        assert take(1)[0] == "l_max"
        l_vals = []
        while tokens[pos].lower() != "ann":
            l_vals.append(int(take(1)[0]))
        has_q = tuple(1 if v else 0 for v in (l_vals[1:] + [0] * 6))[:6]
        assert take(1)[0].lower() == "ann"
        neurons = int(take(1)[0])
        take(1)

        model = NepModel(
            version=version, model_type=0, num_types=num_types,
            symbols=symbols,
            atomic_numbers=tuple(atomic_number(s) for s in symbols),
            rc_radial=rc_r, rc_angular=rc_a,
            mn_radial=int(np.ceil(mn_r * 1.25)),
            mn_angular=int(np.ceil(mn_a * 1.25)),
            n_max_radial=n_max_r, n_max_angular=n_max_a,
            basis_size_radial=basis_r, basis_size_angular=basis_a,
            l_max=l_vals[0], has_q=has_q, neurons=neurons,
            zbl=zbl, zbl_rc_inner=zbl_inner, zbl_rc_outer=zbl_outer,
        )

        t, neu, dim = num_types, neurons, model.dim
        num_para_ann = (dim + 3) * neu * t + 2  # nep_charge.cu:309
        num_para_desc = model.num_descriptor_params()
        n_values = num_para_ann + num_para_desc + dim
        values = np.array([float(take(1)[0]) for _ in range(n_values)])

        p = 0
        w0 = np.empty((t, neu, dim)); b0 = np.empty((t, neu))
        w1e = np.empty((t, neu)); w1q = np.empty((t, neu))
        for ty in range(t):
            w0[ty] = values[p : p + neu * dim].reshape(neu, dim); p += neu * dim
            b0[ty] = values[p : p + neu]; p += neu
            w1e[ty] = values[p : p + neu]; p += neu
            w1q[ty] = values[p : p + neu]; p += neu
        sqrt_eps = values[p]; p += 1
        b1 = values[p]; p += 1
        t2 = t * t
        nr = (n_max_r + 1) * (basis_r + 1)
        na = (n_max_a + 1) * (basis_a + 1)
        c = values[p : p + t2 * (nr + na)]; p += t2 * (nr + na)
        c_rad = c[: t2 * nr].reshape(nr, t2).T.reshape(t, t, n_max_r + 1, basis_r + 1)
        c_ang = c[t2 * nr :].reshape(na, t2).T.reshape(t, t, n_max_a + 1, basis_a + 1)
        q_scaler = values[p : p + dim]

        params = NepParams(
            w0=jnp.asarray(w0, dtype), b0=jnp.asarray(b0, dtype),
            w1=jnp.asarray(w1e, dtype), b1=jnp.asarray(b1, dtype),
            b1_type=jnp.zeros((t,), dtype),
            c_radial=jnp.asarray(c_rad, dtype),
            c_angular=jnp.asarray(c_ang, dtype),
            q_scaler=jnp.asarray(q_scaler, dtype),
        )
        return NEPCharge(
            model=model, params=params,
            w1_charge=jnp.asarray(w1q, dtype),
            sqrt_epsilon_inf=jnp.asarray(sqrt_eps, dtype),
            charge_mode=charge_mode,
        )

    # ---- pieces ---------------------------------------------------------------

    def energy_and_charge(self, r12, t1, t2):
        """Per-atom (energy_nep, raw charge) from the two-head ANN."""
        return two_head_energy_charge(
            self.model, self.params, self.w1_charge, r12, t1, t2
        )

    def _alpha(self):
        return PI / self.model.rc_radial_max

    def real_space_energy(self, q, r12, idx, nbr_mask):
        """K_C [ 1/2 q1 q2 erfc(alpha d)/d per pair - alpha/sqrt(pi) q^2 ]."""
        alpha = self._alpha()
        d = jnp.sqrt(jnp.sum(r12 * r12, axis=-1))
        rc = self.model.rc_radial_max
        qq = q[:, None] * q[idx]
        erfc_r = jax.scipy.special.erfc(alpha * jnp.minimum(d, rc)) / d
        pair = jnp.where((d < rc) & (nbr_mask > 0), qq * erfc_r, 0.0)
        self_term = -(alpha / jnp.sqrt(PI)) * q * q
        return K_C * (0.5 * jnp.sum(pair, axis=-1) + self_term)

    def kvectors(self, box: Box):
        """Host-side half-space k enumeration (ref: ewald.cu:63-126)."""
        h = np.asarray(box.h, np.float64)
        a1, a2, a3 = h[:, 0], h[:, 1], h[:, 2]
        det = float(np.dot(a1, np.cross(a2, a3)))
        two_pi = 2.0 * np.pi
        b1 = two_pi / det * np.cross(a2, a3)
        b2 = two_pi / det * np.cross(a3, a1)
        b3 = two_pi / det * np.cross(a1, a2)
        alpha = self._alpha()
        volume_k = two_pi**3 / abs(det)

        def area(x, y):
            return np.linalg.norm(np.cross(x, y))

        n1_max = int(alpha * two_pi * area(b2, b3) / volume_k)
        n2_max = int(alpha * two_pi * area(b3, b1) / volume_k)
        n3_max = int(alpha * two_pi * area(b1, b2) / volume_k)
        ksq_max = (two_pi * alpha) ** 2
        ks, gs = [], []
        for n1 in range(0, n1_max + 1):
            for n2 in range(-n2_max, n2_max + 1):
                for n3 in range(-n3_max, n3_max + 1):
                    if n1 == 0 and (n2 < 0 or (n2 == 0 and n3 <= 0)):
                        continue
                    if n1 == 0 and n2 == 0 and n3 == 0:
                        continue
                    k = n1 * b1 + n2 * b2 + n3 * b3
                    ksq = float(np.dot(k, k))
                    if ksq < ksq_max:
                        ks.append(k)
                        gs.append(
                            2.0 * abs(two_pi / det) / ksq
                            * np.exp(-ksq / (4.0 * alpha * alpha))
                        )
        return np.asarray(ks), np.asarray(gs)

    def reciprocal_energy(self, q, positions, kvec, gk):
        """E_rec = K_C sum_halfspace gk |S(k)|^2 with gk = 2 (2pi/V)/k^2
        e^{-k^2/4a^2} (ref: ewald.cu find_k_and_G + per-atom sum; equals the
        textbook (2 pi K_C / V) sum_fullspace |S|^2 e / k^2 — verified
        against the NaCl Madelung constant)."""
        kr = positions @ kvec.T  # (N, K)
        s_re = jnp.sum(q[:, None] * jnp.cos(kr), axis=0)
        s_im = -jnp.sum(q[:, None] * jnp.sin(kr), axis=0)
        return K_C * jnp.sum(gk * (s_re**2 + s_im**2))

    # ---- Potential interface ---------------------------------------------------

    def compute_with_state(self, state, nbr: NeighborList) -> PotentialOutput:
        if self.charge_mode not in (1, 2):
            raise NotImplementedError(
                "only charge_mode 1 (real + k-space) and 2 (k-space only) "
                "exist (ref: nep_charge.cu:118-141)"
            )
        mask = state.mask
        type_ = state.type
        t2 = type_[nbr.idx]
        dtype = state.position.dtype
        alpha = self._alpha()
        use_pppm = self.kspace_method == "pppm"
        if use_pppm:
            from gpumd_tpu.potentials.nep.pppm import (
                best_mesh,
                pppm_reciprocal_energy,
                pppm_virial_total,
            )

            mesh = self.pppm_mesh or best_mesh(state.box)
            e_rec_fn = lambda q, pos: pppm_reciprocal_energy(
                q, pos, state.box, alpha, mesh
            )
        else:
            kvec_np, gk_np = self.kvectors(state.box)
            kvec = jnp.asarray(kvec_np, dtype)
            gk = jnp.asarray(gk_np, dtype)
            e_rec_fn = lambda q, pos: self.reciprocal_energy(q, pos, kvec, gk)

        def total_energy(r12, pos):
            e_nep, q_raw = self.energy_and_charge(r12, type_, t2)
            q_raw = q_raw * mask
            n_real = jnp.maximum(jnp.sum(mask), 1.0)
            q = (q_raw - jnp.sum(q_raw) / n_real) * mask
            if self.charge_mode == 1:
                e_real = self.real_space_energy(q, r12, nbr.idx, nbr.mask)
            else:
                # charge_mode 2: k-space electrostatics only — the real-
                # space erfc pair term and the self energy are absent
                # (ref: find_force_charge_real_space is mode-1 gated,
                # nep_charge.cu:1429)
                e_real = jnp.zeros_like(q)
            e_rec = e_rec_fn(q, pos)
            e_atoms = (e_nep + e_real) * mask
            return jnp.sum(e_atoms) + e_rec, (e_atoms, e_rec, q)

        (e_tot, (e_atoms, e_rec, q)), grads = jax.value_and_grad(
            total_energy, argnums=(0, 1), has_aux=True
        )(nbr.r12, state.position)
        p, dpos = grads
        force_pair, virial = forces_virial_from_partials(p, nbr)
        force = force_pair - dpos  # direct position gradient (reciprocal)
        # Reciprocal virial: exact total via the analytic k-space expression,
        # spread uniformly (per-atom attribution planned).
        if use_pppm:
            w_rec = pppm_virial_total(q, state.position, state.box, alpha, mesh)
        else:
            kr = state.position @ kvec.T
            s_re = jnp.sum(q[:, None] * jnp.cos(kr), axis=0)
            s_im = -jnp.sum(q[:, None] * jnp.sin(kr), axis=0)
            s2 = s_re**2 + s_im**2
            ksq = jnp.sum(kvec * kvec, axis=1)
            pref = K_C * gk * s2
            eye = jnp.eye(3, dtype=dtype)
            w_rec = jnp.einsum("k,ab->ab", pref, eye) - jnp.einsum(
                "k,ka,kb->ab",
                pref * 2.0 * (1.0 / ksq + 1.0 / (4.0 * alpha**2)),
                kvec, kvec,
            )
        n_real = jnp.maximum(jnp.sum(mask), 1.0)
        virial = virial + w_rec[None] / n_real * mask[:, None, None]
        # fold the reciprocal energy into per-atom energies uniformly
        e_atoms = e_atoms + (e_rec / n_real) * mask
        return PotentialOutput(energy=e_atoms, force=force, virial=virial)

    def born_effective_charges(self, state, nbr: NeighborList):
        """Born effective charges Z*_i (N, 3, 3), reference bond-centered
        gauge (ref: find_bec_diagonal/radial/angular + scale_bec,
        nep_charge.cu:~800-860): Z* = sqrt(eps_inf) [ q I + sum_pairs
        (+-1/2) r12 (x) dq_center/dr12 ].

        One reverse sweep gives every per-pair charge derivative because
        q_p depends only on its own neighbor row.
        """
        types = state.type
        t2 = types[nbr.idx]
        y = jax.grad(
            lambda r: jnp.sum(self.energy_and_charge(r, types, t2)[1] * state.mask)
        )(nbr.r12)
        _, q_raw = self.energy_and_charge(nbr.r12, types, t2)
        q_raw = q_raw * state.mask
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
        q = (q_raw - jnp.sum(q_raw) / n_real) * state.mask
        b = 0.5 * nbr.r12[..., :, None] * y[..., None, :]
        b = b * nbr.mask[..., None, None]
        own = jnp.sum(b, axis=1)
        recv = jax.ops.segment_sum(
            b.reshape(-1, 3, 3), nbr.idx.reshape(-1),
            num_segments=state.position.shape[0],
        )
        eye = jnp.eye(3, dtype=q.dtype)
        bec = own - recv + q[:, None, None] * eye
        return bec * self.sqrt_epsilon_inf.astype(q.dtype)

    def charges(self, state, nbr: NeighborList):
        """Neutralized per-atom charges (diagnostics / dump_charge)."""
        t2 = state.type[nbr.idx]
        _, q_raw = self.energy_and_charge(nbr.r12, state.type, t2)
        q_raw = q_raw * state.mask
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
        return (q_raw - jnp.sum(q_raw) / n_real) * state.mask
