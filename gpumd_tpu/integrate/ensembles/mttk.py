"""MTTK (Martyna-Tobias-Klein) ensembles: nvt_mttk / npt_mttk / nph_mttk.

Nose-Hoover-chain thermostat + Parrinello-Rahman-style barostat with the
full triclinic cell as a dynamical variable, following the reference's
operator splitting (ref: src/integrate/ensemble_mttk.cu:1-917; Shinoda2004
Eq. (1), Parrinello1981 Eq. (2.24)):

  compute1: pchain -> tchain -> omega_dot(+dt/2) -> nh_v_press
            -> VV half kick -> box(dt/2) -> VV drift -> box(dt/2)
  compute2: VV half kick -> nh_v_press -> omega_dot(+dt/2)
            -> tchain -> pchain

Unlike the reference (chain scalars integrated on the CPU with D2H copies
of the kinetic energy each half step), everything here is carried through
the `lax.scan` aux pytree and stays on device.  The chain updates are
unrolled Python loops over the static chain length (4), so XLA sees pure
scalar arithmetic fused around the two velocity-scale passes.

run.in syntax (parsed in app/gpumd.py):
  ensemble npt_mttk temp T1 T2 [tperiod tau] iso|aniso|tri P1 P2 [pperiod tau]
  ensemble npt_mttk temp T1 T2 x P1 P2 y P1 P2 z P1 P2 [xy ..][xz ..][yz ..]
  ensemble nvt_mttk temp T1 T2 [tperiod tau]
  ensemble nph_mttk iso|aniso|tri P1 P2 [pperiod tau]
Pressures in GPa; tperiod/pperiod in units of timesteps (default 100/1000).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import K_B, PRESSURE_UNIT_CONVERSION

TCHAIN = 4
PCHAIN = 4

NONE, XYZ, XY, YZ, XZ = 0, 1, 2, 3, 4

# index pairs of the 3x3 in the upper-triangle order the reference walks
_IJ = [(i, j) for i in range(3) for j in range(3)]


def _mm(a, b):
    return a @ b


@dataclass(frozen=True)
class MTTK:
    """MTTK integrator.  Static configuration mirrors the reference's
    parsed flags; dynamic chain/cell state rides the aux pytree."""

    # thermostat
    use_thermostat: bool = False
    t_start: float = 300.0
    t_stop: float = 300.0
    t_period: float = 100.0  # timesteps
    # barostat
    use_barostat: bool = False
    p_start: Tuple[Tuple[float, ...], ...] = ((0.0,) * 3,) * 3  # GPa
    p_stop: Tuple[Tuple[float, ...], ...] = ((0.0,) * 3,) * 3  # GPa
    p_flag: Tuple[Tuple[bool, ...], ...] = ((False,) * 3,) * 3
    p_period: float = 1000.0  # timesteps
    couple_type: int = NONE
    non_hydrostatic: bool = False
    need_scale: Tuple[Tuple[bool, ...], ...] = ((True,) * 3,) * 3
    h0_reset_interval: int = 1000
    n_steps: int = 0  # total steps of the run (for T/P ramps)
    mobile: Optional[object] = None
    pinned: Optional[tuple] = None

    # ---- construction helpers ------------------------------------------------

    @staticmethod
    def nvt(t_start, t_stop, t_period=100.0, n_steps=0, **kw) -> "MTTK":
        return MTTK(
            use_thermostat=True, t_start=t_start, t_stop=t_stop,
            t_period=t_period, n_steps=n_steps, **kw,
        )

    @staticmethod
    def npt(
        t_start, t_stop, p1, p2, mode="iso",
        t_period=100.0, p_period=1000.0, n_steps=0, **kw,
    ) -> "MTTK":
        cfg = MTTK._baro_config(p1, p2, mode)
        return MTTK(
            use_thermostat=True, t_start=t_start, t_stop=t_stop,
            t_period=t_period, use_barostat=True, p_period=p_period,
            n_steps=n_steps, **cfg, **kw,
        )

    @staticmethod
    def nph(p1, p2, mode="iso", p_period=1000.0, n_steps=0, **kw) -> "MTTK":
        cfg = MTTK._baro_config(p1, p2, mode)
        return MTTK(use_barostat=True, p_period=p_period, n_steps=n_steps,
                    **cfg, **kw)

    @staticmethod
    def _baro_config(p1, p2, mode):
        """iso/aniso/tri hydrostatic modes (ref: ensemble_mttk.cu:133-160).
        p1/p2 may be scalars (hydrostatic) or dicts {component: (start, stop)}
        with components in {x, y, z, xy, xz, yz} for non-hydrostatic runs."""
        ps = np.zeros((3, 3))
        pe = np.zeros((3, 3))
        flag = np.zeros((3, 3), bool)
        scale = np.ones((3, 3), bool)
        couple = NONE
        nonhydro = False
        if isinstance(p1, dict):
            comp = {"x": (0, 0), "y": (1, 1), "z": (2, 2),
                    "xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}
            for k, (a, b) in p1.items():
                i, j = comp[k]
                ps[i, j] = ps[j, i] = a
                pe[i, j] = pe[j, i] = p2[k][1] if isinstance(p2, dict) else b
                flag[i, j] = flag[j, i] = True
                if i != j:
                    scale[i, j] = scale[j, i] = False
            nonhydro = True
        else:
            for d in range(3):
                ps[d, d] = p1
                pe[d, d] = p2
                flag[d, d] = True
            if mode == "iso":
                couple = XYZ
            if mode == "tri":
                for i in range(3):
                    for j in range(3):
                        if i != j:
                            flag[i, j] = True
                            scale[i, j] = False
        return dict(
            p_start=tuple(map(tuple, ps)), p_stop=tuple(map(tuple, pe)),
            p_flag=tuple(map(tuple, flag.tolist())),
            need_scale=tuple(map(tuple, scale.tolist())),
            couple_type=couple, non_hydrostatic=nonhydro,
        )

    # ---- target schedules ------------------------------------------------

    def _delta(self, aux):
        if self.n_steps <= 0:
            return jnp.zeros((), jnp.float32)
        return aux["i"].astype(jnp.float32) / self.n_steps

    def _t_target(self, aux):
        return self.t_start + (self.t_stop - self.t_start) * self._delta(aux)

    def _p_target(self, aux, dtype):
        """Target stress in eV/A^3 (GPa inputs / PRESSURE_UNIT_CONVERSION)."""
        ps = jnp.asarray(self.p_start, dtype) / PRESSURE_UNIT_CONVERSION
        pe = jnp.asarray(self.p_stop, dtype) / PRESSURE_UNIT_CONVERSION
        d = self._delta(aux).astype(dtype)
        pt = ps + (pe - ps) * d
        hydro = jnp.trace(pt) / 3.0 * jnp.eye(3, dtype=dtype)
        return pt, hydro

    # ---- state helpers ------------------------------------------------

    def _temperature(self, state: MDState):
        ke2 = jnp.sum(
            state.mass * jnp.sum(state.velocity**2, axis=-1) * state.mask
        )
        dof = 3.0 * jnp.sum(state.mask)
        return ke2 / (dof * K_B)

    def _pressure(self, state: MDState):
        """Instantaneous stress tensor in eV/A^3 (virial + kinetic)."""
        m = state.mask
        kin = jnp.einsum(
            "n,na,nb->ab", state.mass * m, state.velocity, state.velocity,
            precision=jax.lax.Precision.HIGHEST,
        )
        w = jnp.einsum("nab,n->ab", state.virial, m,
                   precision=jax.lax.Precision.HIGHEST)
        p = (kin + w) / state.box.volume
        p = 0.5 * (p + p.T)
        if self.couple_type != NONE:
            d = jnp.diagonal(p)
            if self.couple_type == XYZ:
                avg = jnp.mean(d)
                newd = jnp.full((3,), avg, p.dtype)
            elif self.couple_type == XY:
                avg = 0.5 * (d[0] + d[1])
                newd = jnp.asarray([avg, avg, d[2]], p.dtype)
            elif self.couple_type == YZ:
                avg = 0.5 * (d[1] + d[2])
                newd = jnp.asarray([d[0], avg, avg], p.dtype)
            else:
                avg = 0.5 * (d[0] + d[2])
                newd = jnp.asarray([avg, d[1], avg], p.dtype)
            p = p - jnp.diag(d) + jnp.diag(newd)
        return p

    # ---- chain integrations ------------------------------------------------

    def _nhc_temp(self, state, aux, dt):
        """Thermostat chain half-update -> (velocity scale factor, aux')
        (ref: ensemble_mttk.cu:622-654 nhc_temp_integrate)."""
        dt2, dt4, dt8 = dt / 2, dt / 4, dt / 8
        t_target = self._t_target(aux)
        dof = 3.0 * jnp.sum(state.mask)
        t_freq = 1.0 / (self.t_period * dt)
        q = K_B * t_target / (t_freq * t_freq)
        q0 = q * dof
        qn = [q0] + [q] * (TCHAIN - 1)

        eta_dot = aux["eta_dot"]  # (TCHAIN + 1,)
        t_current = self._temperature(state)

        gs = [dof * K_B * (t_current - t_target) / q0]
        for n in range(1, TCHAIN):
            gs.append(None)  # filled in the sweep
        expfac = None
        for n in range(TCHAIN - 1, -1, -1):
            expfac = jnp.exp(-dt8 * eta_dot[n + 1])
            if n > 0:
                g = (qn[n - 1] * eta_dot[n - 1] ** 2 - K_B * t_target) / qn[n]
            else:
                g = gs[0]
            eta_dot = eta_dot.at[n].set((expfac * eta_dot[n] + g * dt4) * expfac)

        factor = jnp.exp(-dt2 * eta_dot[0])

        t_current = t_current * factor * factor
        g0 = dof * K_B * (t_current - t_target) / q0
        # expfac here is exp(-dt8 * eta_dot[1]) from the last loop iteration
        expfac = jnp.exp(-dt8 * eta_dot[1])
        eta_dot = eta_dot.at[0].set((expfac * eta_dot[0] + g0 * dt4) * expfac)
        for n in range(1, TCHAIN):
            expfac = jnp.exp(-dt8 * eta_dot[n + 1])
            g = (qn[n - 1] * eta_dot[n - 1] ** 2 - K_B * t_target) / qn[n]
            eta_dot = eta_dot.at[n].set((expfac * eta_dot[n] + g * dt4) * expfac)

        # eta positions (diagnostics for the conserved quantity only; the
        # reference does not track them): eta_n += dt/2 eta_dot_n
        eta = aux["eta"] + dt2 * eta_dot[:TCHAIN]
        return factor, {**aux, "eta_dot": eta_dot, "eta": eta}

    def _nhc_press(self, state, aux, dt):
        """Barostat-chain half-update acting on omega_dot
        (ref: ensemble_mttk.cu:656-726 nhc_press_integrate)."""
        dt2, dt4, dt8 = dt / 2, dt / 4, dt / 8
        dtype = state.velocity.dtype
        t_target = self._t_target(aux)
        kt = K_B * jnp.where(t_target < 1.0, aux["t_baro"], t_target)
        n_atoms = jnp.sum(state.mask)
        p_freq = 1.0 / (self.p_period * dt)
        omega_mass = (n_atoms + 1.0) * kt / (p_freq * p_freq)
        qp = kt / (p_freq * p_freq)

        omega_dot = aux["omega_dot"]
        eta_p_dot = aux["eta_p_dot"]

        flag = np.asarray(self.p_flag)
        cell_dof = sum(
            1 for i in range(3) for j in range(3) if i <= j and flag[i, j]
        )
        if self.couple_type == XYZ:
            cell_dof = 1
        ke_cur = jnp.zeros((), dtype)
        for i in range(3):
            for j in range(3):
                if i <= j and flag[i, j]:
                    ke_cur = ke_cur + omega_mass * omega_dot[i, j] ** 2
        ke_target = cell_dof * kt

        g0 = (ke_cur - ke_target) / qp
        expfac = None
        for n in range(PCHAIN - 1, -1, -1):
            expfac = jnp.exp(-dt8 * eta_p_dot[n + 1])
            if n > 0:
                g = (qp * eta_p_dot[n - 1] ** 2 - kt) / qp
            else:
                g = g0
            eta_p_dot = eta_p_dot.at[n].set(
                (eta_p_dot[n] * expfac + g * dt4) * expfac
            )

        factor = jnp.exp(-dt2 * eta_p_dot[0])
        mask = jnp.asarray(flag, dtype)
        omega_dot = omega_dot * jnp.where(mask > 0, factor, 1.0)

        ke_cur = jnp.sum(mask * omega_mass * omega_dot**2)
        g0 = (ke_cur - ke_target) / qp
        expfac = jnp.exp(-dt8 * eta_p_dot[1])
        eta_p_dot = eta_p_dot.at[0].set(
            (eta_p_dot[0] * expfac + g0 * dt4) * expfac
        )
        for n in range(1, PCHAIN):
            expfac = jnp.exp(-dt8 * eta_p_dot[n + 1])
            g = (qp * eta_p_dot[n - 1] ** 2 - kt) / qp
            eta_p_dot = eta_p_dot.at[n].set(
                (eta_p_dot[n] * expfac + g * dt4) * expfac
            )
        return {**aux, "omega_dot": omega_dot, "eta_p_dot": eta_p_dot}

    # ---- barostat pieces ------------------------------------------------

    def _omega_dot_update(self, state, aux, dt):
        """omega_dot += dt/2 * V (p_current - p_hydro [- deviatoric]) / W
        (ref: ensemble_mttk.cu:500-521 nh_omega_dot)."""
        dtype = state.velocity.dtype
        dt2 = dt / 2
        p_cur = self._pressure(state)
        p_target, p_hydro = self._p_target(aux, dtype)
        t_target = self._t_target(aux)
        kt = K_B * jnp.where(t_target < 1.0, aux["t_baro"], t_target)
        n_atoms = jnp.sum(state.mask)
        p_freq = 1.0 / (self.p_period * dt)
        omega_mass = (n_atoms + 1.0) * kt / (p_freq * p_freq)

        vol = state.box.volume
        f_omega = vol * (p_cur - p_hydro)
        if self.non_hydrostatic:
            # sigma = V_ref h_ref_inv (S - p_hydro) h_ref_inv^T  (Parrinello1981)
            sigma = aux["vol_ref"] * _mm(
                _mm(aux["h_ref_inv"], p_target - p_hydro), aux["h_ref_inv"].T
            )
            h = state.box.h
            f_dev = _mm(_mm(h, sigma), h.T)
            f_omega = f_omega - f_dev
        flag = jnp.asarray(np.asarray(self.p_flag), dtype)
        omega_dot = aux["omega_dot"] + flag * (f_omega / omega_mass) * dt2
        return {**aux, "omega_dot": omega_dot}

    def _nh_v_press(self, state, aux, dt):
        """Velocity coupling to the cell motion (ref: gpu_nh_v_press)."""
        od = aux["omega_dot"]
        dt4, dt2 = dt / 4, dt / 2
        fx = jnp.exp(-dt4 * od[0, 0])
        fy = jnp.exp(-dt4 * od[1, 1])
        fz = jnp.exp(-dt4 * od[2, 2])
        f = jnp.stack([fx, fy, fz])
        v = state.velocity * f[None, :]
        vx = v[:, 0] - dt2 * (v[:, 1] * od[0, 1] + v[:, 2] * od[0, 2])
        vy = v[:, 1] - dt2 * (vx * od[1, 0] + v[:, 2] * od[1, 2])
        vz = v[:, 2] - dt2 * (vx * od[2, 0] + vy * od[2, 1])
        v = jnp.stack([vx, vy, vz], axis=-1) * f[None, :]
        if self.mobile is not None:
            v = jnp.where(self.mobile[:, None] > 0, v, state.velocity)
        return state._replace(velocity=v * state.mask[:, None])

    def _propagate_box(self, state, aux, dt):
        """h <- exp-splitting update by dt/2, then affine position remap
        (ref: ensemble_mttk.cu:523-599 propagate_box*)."""
        od = aux["omega_dot"]
        dt2, dt4, dt8, dt16 = dt / 2, dt / 4, dt / 8, dt / 16
        h = state.box.h
        h_old_inv = state.box.h_inv
        flag = np.asarray(self.p_flag)
        scale_f = np.asarray(self.need_scale)

        def upd(h, i, j, val):
            return h.at[i, j].set(val)

        def off_diag(h):
            # symmetric Trotter ladder over the three upper/lower couples
            if flag[0][2]:
                e = jnp.exp(dt16 * od[0, 0])
                v = (h[0, 2] * e + dt8 * (od[0, 1] * h[1, 2] + od[0, 2] * h[2, 2])) * e
                h = upd(h, 0, 2, v)
            if flag[1][2]:
                e = jnp.exp(dt8 * od[1, 1])
                v = (h[1, 2] * e + dt4 * (od[1, 0] * h[0, 2] + od[1, 2] * h[2, 2])) * e
                h = upd(h, 1, 2, v)
            if flag[0][2]:
                e = jnp.exp(dt16 * od[0, 0])
                v = (h[0, 2] * e + dt8 * (od[0, 1] * h[1, 2] + od[0, 2] * h[2, 2])) * e
                h = upd(h, 0, 2, v)
            if flag[2][0]:
                e = jnp.exp(dt16 * od[2, 2])
                v = (h[2, 0] * e + dt8 * (od[2, 0] * h[0, 0] + od[2, 1] * h[1, 0])) * e
                h = upd(h, 2, 0, v)
            if flag[1][0]:
                e = jnp.exp(dt8 * od[1, 1])
                v = (h[1, 0] * e + dt4 * (od[1, 0] * h[0, 0] + od[1, 2] * h[2, 0])) * e
                h = upd(h, 1, 0, v)
            if flag[2][0]:
                e = jnp.exp(dt16 * od[2, 2])
                v = (h[2, 0] * e + dt8 * (od[2, 0] * h[0, 0] + od[2, 1] * h[1, 0])) * e
                h = upd(h, 2, 0, v)
            if flag[2][1]:
                e = jnp.exp(dt16 * od[2, 2])
                v = (h[2, 1] * e + dt8 * (od[2, 0] * h[0, 1] + od[2, 1] * h[1, 1])) * e
                h = upd(h, 2, 1, v)
            if flag[0][1]:
                e = jnp.exp(dt8 * od[0, 0])
                v = (h[0, 1] * e + dt4 * (od[0, 1] * h[1, 1] + od[0, 2] * h[2, 1])) * e
                h = upd(h, 0, 1, v)
            if flag[2][1]:
                e = jnp.exp(dt16 * od[2, 2])
                v = (h[2, 1] * e + dt8 * (od[2, 0] * h[0, 1] + od[2, 1] * h[1, 1])) * e
                h = upd(h, 2, 1, v)
            return h

        def diag(h):
            for d in range(3):
                e = jnp.exp(dt4 * od[d, d])
                others = [k for k in range(3) if k != d]
                v = (
                    h[d, d] * e
                    + dt2 * sum(od[d, k] * h[k, d] for k in others)
                ) * e
                h = upd(h, d, d, v)
                for k in others:
                    if scale_f[k][d]:
                        h = upd(h, k, d, h[k, d] * e)
            return h

        h = off_diag(h)
        h = diag(h)
        h = off_diag(h)
        box = state.box.with_h(h)
        # affine remap through old fractional coordinates
        frac = jnp.stack(
            [h_old_inv[k, 0] * state.position[:, 0]
             + h_old_inv[k, 1] * state.position[:, 1]
             + h_old_inv[k, 2] * state.position[:, 2] for k in range(3)],
            axis=-1,
        )
        pos = box.cartesian(frac)
        unwrapped = state.unwrapped_position
        if unwrapped is not None:
            fu = jnp.stack(
                [h_old_inv[k, 0] * unwrapped[:, 0]
                 + h_old_inv[k, 1] * unwrapped[:, 1]
                 + h_old_inv[k, 2] * unwrapped[:, 2] for k in range(3)],
                axis=-1,
            )
            unwrapped = box.cartesian(fu)
        return state._replace(position=pos, box=box,
                              unwrapped_position=unwrapped)

    def _maybe_reset_href(self, state, aux):
        if not (self.non_hydrostatic and self.h0_reset_interval > 0):
            return aux
        do = (aux["i"] % self.h0_reset_interval) == 0
        h_ref_inv = jnp.where(do, state.box.h_inv, aux["h_ref_inv"])
        vol_ref = jnp.where(do, state.box.volume, aux["vol_ref"])
        return {**aux, "h_ref_inv": h_ref_inv, "vol_ref": vol_ref}

    # ---- Ensemble protocol ------------------------------------------------

    def init(self, state: MDState):
        dtype = state.velocity.dtype
        t_baro = self._temperature(state)
        if self.use_thermostat:
            t_baro = jnp.maximum(t_baro, self.t_start)
        return {
            "i": jnp.zeros((), jnp.int32),
            "eta_dot": jnp.zeros((TCHAIN + 1,), dtype),
            "eta_p_dot": jnp.zeros((PCHAIN + 1,), dtype),
            "omega_dot": jnp.zeros((3, 3), dtype),
            "eta": jnp.zeros((TCHAIN,), dtype),
            "h_ref_inv": state.box.h_inv.astype(dtype),
            "vol_ref": state.box.volume.astype(dtype),
            "t_baro": t_baro.astype(dtype),
        }

    def step1(self, state: MDState, aux, dt):
        if self.use_barostat:
            aux = self._maybe_reset_href(state, aux)
            aux = self._nhc_press(state, aux, dt)
        if self.use_thermostat:
            factor, aux = self._nhc_temp(state, aux, dt)
            state = state._replace(velocity=state.velocity * factor)
        if self.use_barostat:
            aux = self._omega_dot_update(state, aux, dt)
            state = self._nh_v_press(state, aux, dt)
        state = velocity_verlet_step1(
            state, dt, self.mobile, self.pinned, drift=False
        )
        if self.use_barostat:
            state = self._propagate_box(state, aux, dt)
        state = velocity_verlet_step1(
            state, dt, self.mobile, self.pinned, kick=False
        )
        if self.use_barostat:
            state = self._propagate_box(state, aux, dt)
        return state, aux

    def step2(self, state: MDState, aux, dt):
        state = velocity_verlet_step2(state, dt, self.mobile, self.pinned)
        if self.use_barostat:
            state = self._nh_v_press(state, aux, dt)
            aux = self._omega_dot_update(state, aux, dt)
        if self.use_thermostat:
            factor, aux = self._nhc_temp(state, aux, dt)
            state = state._replace(velocity=state.velocity * factor)
        if self.use_barostat:
            aux = self._nhc_press(state, aux, dt)
        return state, {**aux, "i": aux["i"] + 1}


@dataclass(frozen=True)
class NPHug(MTTK):
    """NPT Hugoniostat (ref: src/integrate/ensemble_nphug.cu): MTTK NPT
    whose thermostat target follows the Hugoniot condition

        dHugo = [1/2 (P + P0)(V0 - V) + E0 - E] / (3 N kB)
        T_target = T_current + dHugo   (floor 1 K)

    P is the uniaxial stress component for x|y|z compression or the
    hydrostatic mean for iso/aniso/tri; (P0, V0, E0) default to the
    pre-shock state at step 0.  E includes the kinetic part via
    E = U + 1.5 N kB T (ref: get_thermo/get_target_temp)."""

    p0: Optional[float] = None  # eV/A^3
    v0: Optional[float] = None  # A^3
    e0: Optional[float] = None  # eV
    uniaxial: int = -1  # -1 hydro, 0/1/2 = x/y/z

    def _measure(self, state: MDState):
        t_cur = self._temperature(state)
        n_real = jnp.sum(state.mask)
        pe = jnp.sum(state.potential_energy * state.mask)
        e_cur = pe + 1.5 * n_real * K_B * t_cur
        p = self._pressure(state)
        if self.uniaxial >= 0:
            p_h = p[self.uniaxial, self.uniaxial]
        else:
            p_h = jnp.trace(p) / 3.0
        return t_cur, e_cur, p_h, state.box.volume

    def init(self, state: MDState):
        aux = super().init(state)
        dtype = state.velocity.dtype
        t_cur, e_cur, p_h, vol = self._measure(state)
        aux["hug_p0"] = (
            jnp.asarray(self.p0, dtype) if self.p0 is not None else p_h
        ).astype(dtype)
        aux["hug_v0"] = (
            jnp.asarray(self.v0, dtype) if self.v0 is not None else vol
        ).astype(dtype)
        aux["hug_e0"] = (
            jnp.asarray(self.e0, dtype) if self.e0 is not None else e_cur
        ).astype(dtype)
        aux["t_hug"] = t_cur.astype(dtype)
        return aux

    def _t_target(self, aux):
        return aux["t_hug"]

    def step1(self, state: MDState, aux, dt):
        t_cur, e_cur, p_h, vol = self._measure(state)
        n_real = jnp.sum(state.mask)
        dhugo = (
            0.5 * (p_h + aux["hug_p0"]) * (aux["hug_v0"] - vol)
            + aux["hug_e0"] - e_cur
        ) / (3.0 * n_real * K_B)
        aux = {**aux, "t_hug": jnp.maximum(t_cur + dhugo, 1.0)}
        return super().step1(state, aux, dt)
