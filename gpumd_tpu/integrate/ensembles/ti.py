"""Thermodynamic-integration ensembles (free-energy methods).

`ti_spring` — nonequilibrium Frenkel-Ladd switching to an Einstein crystal
(ref: src/integrate/ensemble_ti_spring.cu:1-391):

  * global Langevin thermostat at T (inherited behavior of Ensemble_LAN);
  * reference positions x0 frozen at run start; mixed force
      f = (1 - lambda) f_pot + lambda (-k (x - x0))
  * lambda(t): equilibrate t_equil steps, switch 0->1 over t_switch with the
    C3-continuous polynomial switch, equilibrate, switch back 1->0;
  * spring constants per element either user-given or auto-estimated from
    the equilibration MSD (k = 3 kB T / <msd>_element);
  * accumulates E_diff = 1/2 integral (U - U_spring) |dlambda| / N over both
    switching legs (forward work minus backward work halved) and combines
    with the analytic Einstein free energy E_Ein for F = E_Ein + E_diff.

Everything (MSD accumulation, k estimation, lambda schedule, work integral)
runs inside the scan carry; only the csv/yaml output is host-side.

`ti_rs` / `ti_as` (reversible scaling / adiabatic switching) build on the
same machinery and arrive with the lambda-scaled-Hamiltonian variant.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.integrate.verlet import velocity_verlet_step1, velocity_verlet_step2
from gpumd_tpu.model.state import MDState
from gpumd_tpu.units import HBAR, K_B


@dataclass(frozen=True)
class TISpring:
    """ti_spring (Frenkel-Ladd nonequilibrium switching).

    run.in: ensemble ti_spring temp T [tperiod tau] [tswitch n tequil n]
            [press P] [spring El k ...]
    """

    temperature: float = 300.0
    coupling: float = 100.0  # tau/dt (tperiod)
    t_switch: int = -1  # auto: 0.4 * n_steps
    t_equil: int = -1  # auto: 0.1 * n_steps
    target_pressure: float = 0.0  # eV/A^3 (parsed from GPa)
    # per-TYPE spring constants (eV/A^2); None -> auto from MSD
    spring_k: Optional[Tuple[float, ...]] = None
    num_types: int = 1
    n_steps: int = 0
    seed: int = 12345
    mobile: Optional[object] = None

    csv_name = "ti_spring.csv"
    csv_header = "lambda,dlambda,pe,espring\n"
    yaml_name = "ti_spring.yaml"

    def observe(self, state, aux):
        return (aux["lambda"], aux["dlambda"], aux["pe"], aux["espring"])

    def csv_rows(self, obs, n):
        lam, dlam, pe, es = (np.asarray(o) for o in obs)
        for r in range(len(lam)):
            if dlam[r] != 0.0:
                yield (f"{lam[r]:e},{dlam[r]:e},"
                       f"{pe[r] / n:e},{es[r] / n:e}\n")

    def _schedule(self):
        ts = self.t_switch if self.t_switch > 0 else int(self.n_steps * 0.4)
        te = self.t_equil if self.t_equil > 0 else int(self.n_steps * 0.1)
        return ts, te

    # C3 switch (ref: ensemble_ti_spring.cu:switch_func/dswitch_func)
    @staticmethod
    def _switch(t):
        t2 = t * t
        t5 = t2 * t2 * t
        return (70.0 * t2 * t2 - 315.0 * t2 * t + 540.0 * t2 - 420.0 * t
                + 126.0) * t5

    @staticmethod
    def _dswitch(t, t_switch):
        t2 = t * t
        t4 = t2 * t2
        return ((630.0 * t2 * t2 - 2520.0 * t2 * t + 3780.0 * t2
                 - 2520.0 * t + 630.0) * t4) / t_switch

    def init(self, state: MDState):
        dtype = state.velocity.dtype
        n = state.position.shape[0]
        if self.spring_k is not None:
            k = jnp.asarray(self.spring_k, dtype)[state.type]
            k = k * state.mask
        else:
            k = jnp.zeros((n,), dtype)  # MSD accumulator during equil
        return {
            "i": jnp.zeros((), jnp.int32),
            "key": jax.random.PRNGKey(self.seed),
            "x0": state.position,
            "k": k,
            "lambda": jnp.zeros((), dtype),
            "dlambda": jnp.zeros((), dtype),
            "e_diff": jnp.zeros((), dtype),
            "avg_pressure": jnp.zeros((), dtype),
            "pe": jnp.zeros((), dtype),
            "espring": jnp.zeros((), dtype),
        }

    # ---- Langevin thermostat (global, ref: Ensemble_LAN type 3) -----------

    def _kick(self, state, key):
        c1 = jnp.exp(-0.5 / self.coupling)
        dtype = state.velocity.dtype
        c2 = jnp.sqrt(
            (1.0 - c1 * c1) * K_B * self.temperature / state.mass
        ).astype(dtype)
        noise = jax.random.normal(key, state.velocity.shape, dtype)
        v = c1 * state.velocity + c2[:, None] * noise
        from gpumd_tpu.integrate.velocity import _zero_linear_momentum

        v = _zero_linear_momentum(v, state.mass, state.mask)
        return state._replace(velocity=v * state.mask[:, None])

    def step1(self, state, aux, dt):
        key, sub = jax.random.split(aux["key"])
        state = self._kick(state, sub)
        aux = {**aux, "key": key}
        return velocity_verlet_step1(state, dt, self.mobile), aux

    def _find_lambda(self, state, aux):
        """Per-step lambda schedule + MSD/k estimation + work integral
        (ref: ensemble_ti_spring.cu:295-365 find_lambda)."""
        dtype = state.velocity.dtype
        ts, te = self._schedule()
        i = aux["i"]
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)

        disp = state.box.minimum_image(state.position - aux["x0"])
        d2 = jnp.sum(disp * disp, axis=-1) * state.mask

        k = aux["k"]
        if self.spring_k is None:
            # equilibration: accumulate MSD
            k = jnp.where(i < te, k + d2, k)
            # at step te - 1: convert per-element mean MSD -> spring const
            def to_spring(kacc):
                ksum = jax.ops.segment_sum(
                    kacc * state.mask, state.type, self.num_types
                )
                cnt = jax.ops.segment_sum(
                    state.mask, state.type, self.num_types
                )
                msd_el = ksum / jnp.maximum(cnt, 1.0) / te
                k_el = 3.0 * K_B * self.temperature / jnp.maximum(
                    msd_el, 1e-12
                )
                return k_el[state.type] * state.mask

            k = jnp.where(i == te - 1, to_spring(k), k)
        avg_p = aux["avg_pressure"]

        t = (i - te).astype(dtype)
        r = 1.0 / ts
        leg1 = (t >= 0) & (t <= ts)
        leg2 = (t >= te + ts) & (t <= te + 2 * ts)
        x1 = jnp.clip(t * r, 0.0, 1.0)
        x2 = jnp.clip(1.0 - (t - ts - te) * r, 0.0, 1.0)
        lam = jnp.where(
            leg1, self._switch(x1), jnp.where(leg2, self._switch(x2), aux["lambda"])
        )
        dlam = jnp.where(
            leg1, self._dswitch(x1, ts),
            jnp.where(leg2, -self._dswitch(x2, ts), 0.0),
        )
        pe = jnp.sum(state.potential_energy * state.mask)
        espring = jnp.sum(0.5 * k * d2)
        de = jnp.where(
            leg1 | leg2,
            0.5 * (pe - espring) * jnp.abs(dlam) / n_real,
            0.0,
        )
        return {
            **aux, "k": k, "lambda": lam, "dlambda": dlam,
            "e_diff": aux["e_diff"] + de, "avg_pressure": avg_p,
            "pe": pe, "espring": espring,
        }, disp

    def step2(self, state, aux, dt):
        aux, disp = self._find_lambda(state, aux)
        # mixed force (ref: gpu_add_spring_force)
        lam = aux["lambda"]
        f = (1.0 - lam) * state.force + lam * (-aux["k"][:, None] * disp)
        state = state._replace(force=f * state.mask[:, None])
        state = velocity_verlet_step2(state, dt, self.mobile)
        key, sub = jax.random.split(aux["key"])
        state = self._kick(state, sub)
        return state, {**aux, "key": key, "i": aux["i"] + 1}

    # ---- host-side summary ------------------------------------------------

    def free_energy(self, state: MDState, aux) -> dict:
        """E_Ein + E_diff summary (ref: ~Ensemble_TI_Spring destructor)."""
        kT = K_B * self.temperature
        k = np.asarray(aux["k"])
        mass = np.asarray(state.mass)
        mask = np.asarray(state.mask) > 0
        n = int(mask.sum())
        lnterm = np.log(np.sqrt(k[mask] / mass[mask]) * HBAR / kT)
        e_ein = 3.0 * kT * float(np.sum(lnterm)) / n
        e_diff = float(aux["e_diff"])
        v = float(state.box.volume) / n
        return {
            "E_Einstein": e_ein,
            "E_diff": e_diff,
            "F": e_ein + e_diff,
            "T": self.temperature,
            "V": v,
            "P": self.target_pressure,
            "G": e_ein + e_diff + self.target_pressure * v,
        }


@dataclass(frozen=True)
class TI(TISpring):
    """Equilibrium TI at fixed lambda (ref: src/integrate/ensemble_ti.cu):
    f = (1 - lambda) f_pot + lambda (-k (x - x0)) under a global Langevin
    thermostat; ti.csv rows (pe/N, espring/N) integrate dF/dlambda on a
    user-chosen lambda grid across runs.

    run.in: ensemble ti lambda x temp T [tperiod tau] spring El k ...
    """

    lam: float = 0.0

    csv_name = "ti.csv"
    csv_header = "pe,espring\n"
    yaml_name = None

    def init(self, state: MDState):
        if self.spring_k is None:
            raise ValueError("ti: spring constants are required")
        aux = super().init(state)
        dtype = state.velocity.dtype
        aux["lambda"] = jnp.asarray(self.lam, dtype)
        return aux

    def step2(self, state, aux, dt):
        disp = state.box.minimum_image(state.position - aux["x0"])
        d2 = jnp.sum(disp * disp, axis=-1) * state.mask
        pe = jnp.sum(state.potential_energy * state.mask)
        espring = jnp.sum(0.5 * aux["k"] * d2)
        f = (1.0 - self.lam) * state.force - self.lam * aux["k"][:, None] * disp
        state = state._replace(force=f * state.mask[:, None])
        state = velocity_verlet_step2(state, dt, self.mobile)
        key, sub = jax.random.split(aux["key"])
        state = self._kick(state, sub)
        return state, {
            **aux, "key": key, "i": aux["i"] + 1,
            "pe": pe, "espring": espring,
        }

    def observe(self, state, aux):
        return (aux["pe"], aux["espring"])

    def csv_rows(self, obs, n):
        pe, es = (np.asarray(o) for o in obs)
        for r in range(len(pe)):
            yield f"{pe[r] / n:e},{es[r] / n:e}\n"


from gpumd_tpu.integrate.ensembles.mttk import MTTK  # noqa: E402


@dataclass(frozen=True)
class TIRS(MTTK):
    """Reversible-scaling TI (ref: src/integrate/ensemble_ti_rs.cu):
    NPT MTTK with the whole Hamiltonian (forces, virial, target pressure)
    scaled by lambda(t) ramping 1 -> lambda_f = T_start / T_max and back;
    one run yields F(T) over [T_start, T_max] via reversible scaling.
    Writes ti_rs.csv rows (lambda, dlambda, enthalpy/N).

    run.in: ensemble ti_rs temp T Tmax iso|aniso|tri P
            [tperiod x] [pperiod x] [tswitch n] [tequil n]
    """

    t_max: float = 0.0
    t_switch: int = -1
    t_equil: int = -1

    csv_name = "ti_rs.csv"
    csv_header = "lambda,dlambda,enthalpy\n"
    yaml_name = None

    @property
    def lambda_f(self):
        return self.t_start / self.t_max

    def _schedule(self):
        ts = self.t_switch if self.t_switch > 0 else int(self.n_steps * 0.4)
        te = self.t_equil if self.t_equil > 0 else int(self.n_steps * 0.1)
        return ts, te

    # switch_func/dswitch_func (ref: ensemble_ti_rs.cu:283-289)
    def _switch(self, x):
        a = 1.0 / self.lambda_f - 1.0
        return 1.0 / (1.0 + x * a)

    def _dswitch(self, x, ts):
        a = 1.0 / self.lambda_f - 1.0
        return -(a / (1.0 + a * x) ** 2) / ts

    def _lambda_update(self, aux, dtype):
        ts, te = self._schedule()
        t = (aux["i"] - te).astype(dtype)
        r = 1.0 / ts
        leg1 = (t >= 0) & (t < ts)
        leg2 = (t >= te + ts) & (t <= te + 2 * ts)
        x1 = jnp.clip(t * r, 0.0, 1.0)
        x2 = jnp.clip(1.0 - (t - ts - te) * r, 0.0, 1.0)
        lam = jnp.where(
            leg1, self._switch(x1),
            jnp.where(leg2, self._switch(x2), aux.get("lambda", 1.0)),
        )
        dlam = jnp.where(
            leg1, self._dswitch(x1, ts),
            jnp.where(leg2, -self._dswitch(x2, ts), 0.0),
        )
        return lam, dlam

    def init(self, state: MDState):
        aux = super().init(state)
        dtype = state.velocity.dtype
        aux["lambda"] = jnp.ones((), dtype)
        aux["dlambda"] = jnp.zeros((), dtype)
        aux["pe"] = jnp.zeros((), dtype)
        aux["vol"] = state.box.volume.astype(dtype)
        return aux

    def _p_target(self, aux, dtype):
        # target pressure scales with lambda (ref: get_target_pressure)
        pt, hydro = super()._p_target(aux, dtype)
        lam = aux["lambda"].astype(dtype)
        return pt * lam, hydro * lam

    def step2(self, state, aux, dt):
        dtype = state.velocity.dtype
        lam, dlam = self._lambda_update(aux, dtype)
        aux = {**aux, "lambda": lam, "dlambda": dlam,
               "pe": jnp.sum(state.potential_energy * state.mask),
               "vol": state.box.volume.astype(dtype)}
        state = state._replace(
            force=state.force * lam, virial=state.virial * lam
        )
        return super().step2(state, aux, dt)

    def observe(self, state, aux):
        return (aux["lambda"], aux["dlambda"], aux["pe"], aux["vol"])

    def csv_rows(self, obs, n):
        from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

        lam, dlam, pe, vol = (np.asarray(o) for o in obs)
        p0 = self.p_start[0][0] / PRESSURE_UNIT_CONVERSION
        for r in range(len(lam)):
            if dlam[r] != 0.0:
                h = (pe[r] + p0 * vol[r]) / n
                yield f"{lam[r]:e},{dlam[r]:e},{h:e}\n"


@dataclass(frozen=True)
class TIAS(MTTK):
    """Adiabatic-switching TI over pressure (ref: ensemble_ti_as.cu):
    MTTK NPT whose diagonal target pressure ramps p_min -> p_max and back;
    G(p) follows from integrating V dp along the quasistatic ramp.
    Writes ti_as.csv rows (p, V/N).

    run.in: ensemble ti_as temp T press pmin pmax [iso P] [tperiod x]
            [pperiod x] [tswitch n] [tequil n]
    """

    p_min: float = 0.0  # GPa
    p_max: float = 0.0  # GPa
    t_switch: int = -1
    t_equil: int = -1

    csv_name = "ti_as.csv"
    csv_header = "p,V\n"
    yaml_name = None

    def _schedule(self):
        ts = self.t_switch if self.t_switch > 0 else int(self.n_steps * 0.4)
        te = self.t_equil if self.t_equil > 0 else int(self.n_steps * 0.1)
        return ts, te

    def _pp(self, aux, dtype):
        """Instantaneous diagonal pressure target in eV/A^3 + in-leg flag
        (ref: ensemble_ti_as.cu get_target_pressure; the backward leg here
        subtracts the equilibration offset so the ramp returns exactly to
        p_min — the reference's `(t - t_switch)` keeps a t_equil offset that
        undershoots p_min at the end of the backward leg)."""
        from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

        ts, te = self._schedule()
        t = aux["i"].astype(dtype)
        r = 1.0 / max(ts - 1, 1)
        pmin = self.p_min / PRESSURE_UNIT_CONVERSION
        pmax = self.p_max / PRESSURE_UNIT_CONVERSION
        leg1 = (t >= 0) & (t < ts)
        leg2 = (t >= te + ts) & (t <= te + 2 * ts)
        back = jnp.clip((t - ts - te) * r, 0.0, 1.0)
        pp = jnp.where(
            leg1, pmin + t * r * (pmax - pmin),
            jnp.where(leg2, pmax - back * (pmax - pmin), pmin),
        )
        # between the legs hold at p_max (equilibration at load)
        hold = (t >= ts) & (t < te + ts)
        pp = jnp.where(hold, pmax, pp)
        return pp, (leg1 | leg2)

    def _p_target(self, aux, dtype):
        pp, _ = self._pp(aux, dtype)
        pt = jnp.eye(3, dtype=dtype) * pp
        return pt, pt

    def init(self, state: MDState):
        aux = super().init(state)
        dtype = state.velocity.dtype
        aux["vol"] = state.box.volume.astype(dtype)
        return aux

    def step2(self, state, aux, dt):
        aux = {**aux, "vol": state.box.volume.astype(state.velocity.dtype)}
        return super().step2(state, aux, dt)

    def observe(self, state, aux):
        pp, inleg = self._pp(aux, aux["vol"].dtype)
        return (pp, aux["vol"], inleg)

    def csv_rows(self, obs, n):
        from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

        pp, vol, inleg = (np.asarray(o) for o in obs)
        for r in range(len(pp)):
            if inleg[r]:
                yield f"{pp[r] * PRESSURE_UNIT_CONVERSION:e},{vol[r] / n:e}\n"


@dataclass(frozen=True)
class TILiquid(TISpring):
    """ti_liquid — nonequilibrium switching to the Uhlenbeck-Ford fluid
    (ref: src/integrate/ensemble_ti_liquid.cu:1-528).

    The UF reference model is the purely repulsive pair fluid
        beta u(r) = -p ln(1 - exp(-r^2 / sigma^2)),
    whose excess free energy is known analytically (spline tables over the
    reduced density x = (pi sigma^2)^{3/2} rho / 2, extracted from
    ensemble_ti_liquid.cuh:77-760 into assets/uf_spline.npz).  The run mixes
        f = (1 - lambda) f_pot + lambda f_UF
    under the global Langevin thermostat with the same quintic switch
    schedule as ti_spring, accumulates
        E_diff = 1/2 integral (U - U_UF) |dlambda| / N,
    and combines with E_ref = (F_UF + F_idealgas)/N for the absolute
    Helmholtz/Gibbs free energy of the liquid (ref destructor, :284-387).

    UF pair sums are evaluated all-pairs with MIC in row blocks (the model
    is only used at liquid sizes; exp(-r^2/sigma^2) decays in ~2 A so the
    masked far pairs contribute exactly zero force and energy).

    run.in: ensemble ti_liquid temp T [tperiod tau] [tswitch n tequil n]
            [press P] [sigmasqrd s2] [p P_UF]
    """

    sigma_sqrd: float = 2.0  # sigma^2 (A^2)
    p_uf: float = 50.0  # UF softness p in {1, 25, 50, 75, 100}

    csv_name = "ti_liquid.csv"
    csv_header = "lambda,dlambda,pe,eUF\n"
    yaml_name = "ti_liquid.yaml"

    def init(self, state: MDState):
        dtype = state.velocity.dtype
        return {
            "i": jnp.zeros((), jnp.int32),
            "key": jax.random.PRNGKey(self.seed),
            "lambda": jnp.zeros((), dtype),
            "dlambda": jnp.zeros((), dtype),
            "e_diff": jnp.zeros((), dtype),
            "pe": jnp.zeros((), dtype),
            "euf": jnp.zeros((), dtype),
        }

    def _uf_pair(self, state):
        """Per-atom UF energies + forces, all-pairs MIC in row blocks
        (ref: calc_UF_force, ensemble_ti_liquid.cu:38-96)."""
        dtype = state.velocity.dtype
        pos = state.position
        mask = state.mask
        n = pos.shape[0]
        beta = 1.0 / (K_B * self.temperature)
        s2 = self.sigma_sqrd
        pref_f = -2.0 * self.p_uf / (beta * s2)
        block = 512
        n_pad = ((n + block - 1) // block) * block
        idx = jnp.arange(n_pad).reshape(-1, block)

        def row_block(rows):
            valid = (rows < n) & (mask[jnp.clip(rows, 0, n - 1)] > 0)
            xi = pos[jnp.clip(rows, 0, n - 1)]
            disp = state.box.minimum_image(pos[None, :, :] - xi[:, None, :])
            d2 = jnp.sum(disp * disp, axis=-1)  # (block, n)
            pair = (
                valid[:, None]
                & (mask[None, :] > 0)
                & (d2 > 1e-9)
            )
            x = jnp.clip(d2 / s2, 1e-12, 60.0)
            # force factor -2p / (beta s2 (exp(x) - 1)); e = -p/beta ln(1-e^-x)
            fac = jnp.where(pair, pref_f / jnp.expm1(x), 0.0)
            e = jnp.where(
                pair,
                -(self.p_uf / beta) * jnp.log1p(-jnp.exp(-x)),
                0.0,
            )
            f = jnp.einsum("bn,bnx->bx", fac, disp)
            return 0.5 * jnp.sum(e, axis=1).astype(dtype), f.astype(dtype)

        e_uf, f_uf = jax.lax.map(row_block, idx)
        return e_uf.reshape(n_pad)[:n], f_uf.reshape(n_pad, 3)[:n]

    def step2(self, state, aux, dt):
        dtype = state.velocity.dtype
        ts, te = self._schedule()
        i = aux["i"]
        n_real = jnp.maximum(jnp.sum(state.mask), 1.0)
        # lambda schedule (identical switch to ti_spring; ref :469-497)
        t = (i - te).astype(dtype)
        r = 1.0 / ts
        leg1 = (t >= 0) & (t <= ts)
        leg2 = (t >= te + ts) & (t <= te + 2 * ts)
        x1 = jnp.clip(t * r, 0.0, 1.0)
        x2 = jnp.clip(1.0 - (t - ts - te) * r, 0.0, 1.0)
        lam = jnp.where(
            leg1, self._switch(x1),
            jnp.where(leg2, self._switch(x2), aux["lambda"]),
        )
        dlam = jnp.where(
            leg1, self._dswitch(x1, ts),
            jnp.where(leg2, -self._dswitch(x2, ts), 0.0),
        )
        e_uf_atom, f_uf = self._uf_pair(state)
        pe = jnp.sum(state.potential_energy * state.mask)
        euf = jnp.sum(e_uf_atom * state.mask)
        de = jnp.where(
            leg1 | leg2, 0.5 * (pe - euf) * jnp.abs(dlam) / n_real, 0.0
        )
        f = (1.0 - lam) * state.force + lam * f_uf
        state = state._replace(force=f * state.mask[:, None])
        state = velocity_verlet_step2(state, dt, self.mobile)
        key, sub = jax.random.split(aux["key"])
        state = self._kick(state, sub)
        return state, {
            **aux, "key": key, "i": i + 1, "lambda": lam, "dlambda": dlam,
            "e_diff": aux["e_diff"] + de, "pe": pe, "euf": euf,
        }

    def observe(self, state, aux):
        return (aux["lambda"], aux["dlambda"], aux["pe"], aux["euf"])

    def csv_rows(self, obs, n):
        lam, dlam, pe, euf = (np.asarray(o) for o in obs)
        for r in range(len(lam)):
            if dlam[r] != 0.0:
                yield (f"{lam[r]:e},{dlam[r]:e},"
                       f"{pe[r] / n:e},{euf[r] / n:e}\n")

    # ---- host-side absolute free energy (ref destructor :284-387) ---------

    @staticmethod
    def _fe_uf(x, coef, sum_spline, index):
        """Piecewise spline-integrated UF excess free energy (in kT/atom)
        at reduced density x (ref: Ensemble_TI_Liquid::fe, :205-240)."""
        if x < 0.0025:
            return coef[0] * x * x / 2.0 + coef[1] * x
        if x < 0.1:
            if int(x * 10000) % 25 == 0:
                return sum_spline[index - 1]
            x0 = 0.0025 * int(x * 400)
        elif x < 1:
            if int(x * 1000) % 25 == 0:
                return sum_spline[index - 1]
            x0 = 0.025 * int(x * 40)
        elif x < 4:
            if int(x * 100) % 10 == 0:
                return sum_spline[index - 1]
            x0 = 0.1 * int(x * 10)
        else:
            return sum_spline[index]
        return (
            sum_spline[index - 1]
            + coef[0] * (x * x - x0 * x0) / 2.0
            + coef[1] * (x - x0)
            + (coef[2] - 1.0) * np.log(x / x0)
            - coef[3] * (1.0 / x - 1.0 / x0)
        )

    def free_energy(self, state: MDState, aux) -> dict:
        import os

        kT = K_B * self.temperature
        mask = np.asarray(state.mask) > 0
        mass = np.asarray(state.mass)[mask]
        types = np.asarray(state.type)[mask]
        n = int(mask.sum())
        v = float(state.box.volume) / n  # volume per atom; rho = 1/v

        x_uf = (np.pi * self.sigma_sqrd) ** 1.5 / (2.0 * v)
        if x_uf < 0.1:
            index = int(x_uf * 400)
        elif x_uf < 1:
            index = 40 + int(x_uf * 40 - 4)
        elif x_uf < 4:
            index = 76 + int(x_uf * 10 - 10)
        else:
            index = 105
        asset = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "assets", "uf_spline.npz",
        )
        tab = np.load(asset)
        pkey = int(round(self.p_uf))
        coef = tab[f"spline{pkey}"][index]
        sums = tab[f"sum_spline{pkey}"]
        f_uf = self._fe_uf(x_uf, coef, sums, index) * kT * n

        # ideal-gas part: F_IG = N kT (ln rho - 1 + sum_c c ln c)
        #                        + 3 kT sum_i ln(hbar sqrt(2 pi / m_i kT))
        de_broglie = float(
            np.sum(np.log(HBAR * np.sqrt(2.0 * np.pi / (mass * kT))))
        )
        c_sum = 0.0
        for tt in np.unique(types):
            c = float((types == tt).sum()) / n
            if c > 0:
                c_sum += c * np.log(c)
        f_ig = n * kT * (np.log(1.0 / v) - 1.0 + c_sum) + 3.0 * kT * de_broglie
        e_ref = (f_uf + f_ig) / n
        e_diff = float(aux["e_diff"])
        return {
            "E_UFmodel": e_ref,
            "ES_diff": e_diff,
            "F": e_ref + e_diff,
            "T": self.temperature,
            "V": v,
            "P": self.target_pressure,
            "G": e_ref + e_diff + self.target_pressure * v,
        }
