"""Measure properties: observables computed during run blocks.

Each property follows the reference Property protocol (ref: src/measure/
property.cuh: preprocess/process/postprocess) adapted to the chunked scan
loop:

  * `scalar observers` (heat current, thermo) are stacked every step inside
    the jit scan — essentially free;
  * per-atom samplers (velocities for DOS/SDC, positions for MSD/RDF) fire
    at chunk boundaries (chunk = gcd of all intervals);
  * correlations/transforms run host-side in numpy at postprocess —
    the data volumes are tiny compared to the MD itself.

Output files are format-compatible with the reference (hac.out, kappa.out,
msd.out, sdc.out, dos.out/mvac.out, rdf.out, compute.out).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from gpumd_tpu.units import K_B, KAPPA_UNIT_CONVERSION, TIME_UNIT_CONVERSION


def heat_current_5(state):
    """System heat current, GPUMD 5-component convention
    (ref: compute_heat.cu: jx_in jx_out jy_in jy_out jz)."""
    import jax.numpy as jnp

    w = state.virial
    v = state.velocity
    m = state.mask
    jx_in = jnp.sum((w[:, 0, 0] * v[:, 0] + w[:, 0, 1] * v[:, 1]) * m)
    jx_out = jnp.sum(w[:, 0, 2] * v[:, 2] * m)
    jy_in = jnp.sum((w[:, 1, 0] * v[:, 0] + w[:, 1, 1] * v[:, 1]) * m)
    jy_out = jnp.sum(w[:, 1, 2] * v[:, 2] * m)
    jz = jnp.sum(
        (w[:, 2, 0] * v[:, 0] + w[:, 2, 1] * v[:, 1] + w[:, 2, 2] * v[:, 2]) * m
    )
    return jnp.stack([jx_in, jx_out, jy_in, jy_out, jz])


class HAC:
    """compute_hac sample_interval Nc output_interval -> hac.out
    (ref: src/measure/hac.cu). Green-Kubo: stores J(t), autocorrelates at
    postprocess, writes HAC + running kappa."""

    needs_heat = True

    def __init__(self, sample_interval, nc, output_interval, dt, temperature):
        self.sample_interval = int(sample_interval)
        self.nc = int(nc)
        self.output_interval = int(output_interval)
        self.dt = dt  # natural units per MD step
        self.temperature = temperature
        self.samples: List[np.ndarray] = []
        self.interval = self.sample_interval

    def consume_heat(self, j5_rows, first_global_step):
        """j5_rows: (chunk, 5) heat currents for steps
        first_global_step+1 .. first_global_step+chunk."""
        steps = first_global_step + 1 + np.arange(len(j5_rows))
        sel = (steps % self.sample_interval) == 0
        if sel.any():
            self.samples.append(j5_rows[sel])

    def postprocess(self, session):
        heat = np.concatenate(self.samples, axis=0)  # (Nd, 5)
        nd = len(heat)
        nc = min(self.nc, nd)
        hac = np.zeros((nc, 5))
        # GPUMD in/out cross-correlation convention (hac.cu:111-165)
        pair = {0: 1, 1: 0, 2: 3, 3: 2, 4: 4}
        for lag in range(nc):
            a = heat[: nd - lag]
            b = heat[lag:]
            for k in range(5):
                cross = 0.0 if k == 4 else np.sum(a[:, k] * b[:, pair[k]])
                hac[lag, k] = (np.sum(a[:, k] * b[:, k]) + cross) / (nd - lag)
        dt_sample = self.dt * self.sample_interval
        volume = float(session.state.box.volume)
        factor = (
            dt_sample * 0.5 / (K_B * self.temperature**2 * volume)
        ) * KAPPA_UNIT_CONVERSION
        rtc = np.zeros_like(hac)
        for lag in range(1, nc):
            rtc[lag] = rtc[lag - 1] + (hac[lag - 1] + hac[lag]) * factor
        dt_ps = dt_sample * TIME_UNIT_CONVERSION / 1000.0
        with open(os.path.join(session.workdir, "hac.out"), "a") as f:
            for nd_out in range(nc // self.output_interval):
                c0 = nd_out * self.output_interval
                sl = slice(c0, c0 + self.output_interval)
                h = hac[sl].mean(axis=0)
                r = rtc[sl].mean(axis=0)
                t = (c0 + self.output_interval * 0.5) * dt_ps
                row = [t, *h, *r]
                f.write("".join(f"{x:25.15e}" for x in row) + "\n")


class HNEMDKappa:
    """compute_hnemd output_interval fe_x fe_y fe_z -> kappa.out
    (ref: hnemd_kappa.cu; driving force wired into ForceField)."""

    needs_heat = True

    def __init__(self, output_interval, fe, dt, temperature):
        self.output_interval = int(output_interval)
        self.fe = np.asarray(fe, dtype=float)
        self.fe_mag = float(np.linalg.norm(self.fe))
        self.temperature = temperature
        self.interval = self.output_interval
        self._acc = np.zeros(5)
        self._count = 0

    def consume_heat(self, j5_rows, first_global_step):
        self._acc += j5_rows.sum(axis=0)
        self._count += len(j5_rows)
        # flush whenever a full output window has accumulated

    def maybe_output(self, session):
        while self._count >= self.output_interval:
            volume = float(session.state.box.volume)
            factor = KAPPA_UNIT_CONVERSION / self.output_interval
            factor /= volume * self.temperature * self.fe_mag
            with open(os.path.join(session.workdir, "kappa.out"), "a") as f:
                f.write(
                    "".join(f"{x * factor:25.15f}" for x in self._acc) + "\n"
                )
            self._acc = np.zeros(5)
            self._count -= self.output_interval

    def postprocess(self, session):
        pass


class MSD:
    """compute_msd sample_interval Nc -> msd.out (all atoms; group support
    arrives with the Group machinery).  SDC columns are the MSD slope / 2
    (ref: msd.cu writes msd xyz + sdc xyz per correlation step)."""

    needs_heat = False

    def __init__(self, sample_interval, nc, dt):
        self.sample_interval = int(sample_interval)
        self.nc = int(nc)
        self.dt = dt
        self.interval = self.sample_interval
        self.frames: List[np.ndarray] = []

    def sample_state(self, session, state, step):
        if state.unwrapped_position is None:
            raise ValueError("compute_msd requires unwrapped positions")
        n = session._n
        self.frames.append(np.asarray(state.unwrapped_position)[:n].copy())

    def postprocess(self, session):
        frames = np.stack(self.frames)  # (Nd, N, 3)
        nd = len(frames)
        nc = min(self.nc, nd - 1)
        dt_ps = self.dt * self.sample_interval * TIME_UNIT_CONVERSION / 1000.0
        msd = np.zeros((nc, 3))
        for lag in range(1, nc + 1):
            d = frames[lag:] - frames[: nd - lag]
            msd[lag - 1] = np.mean(d * d, axis=(0, 1))
        # SDC (A^2/ps -> ... GPUMD sdc in A^2/ps): slope/2 per direction
        sdc = np.zeros_like(msd)
        t = np.arange(1, nc + 1) * dt_ps
        sdc[0] = msd[0] / (2 * t[0])
        sdc[1:] = (msd[1:] - msd[:-1]) / (2 * dt_ps)
        with open(os.path.join(session.workdir, "msd.out"), "a") as f:
            f.write(
                f"# compute_msd {self.sample_interval} {self.nc}\n"
                "# format_version 1\n"
                f"# num_atoms {session._n}\n"
                "# columns time_ps msdx msdy msdz sdcx sdcy sdcz\n"
            )
            for i in range(nc):
                row = [t[i], *msd[i], *sdc[i]]
                f.write(" ".join(f"{x:g}" for x in row) + "\n")


class SDC:
    """compute_sdc sample_interval Nc -> sdc.out: VAC and its running
    integral (ref: sdc.cu)."""

    needs_heat = False

    def __init__(self, sample_interval, nc, dt):
        self.sample_interval = int(sample_interval)
        self.nc = int(nc)
        self.dt = dt
        self.interval = self.sample_interval
        self.frames: List[np.ndarray] = []

    def sample_state(self, session, state, step):
        n = session._n
        self.frames.append(np.asarray(state.velocity)[:n].copy())

    def _vac(self):
        v = np.stack(self.frames)  # (Nd, N, 3)
        nd = len(v)
        nc = min(self.nc, nd)
        vac = np.zeros((nc, 3))
        for lag in range(nc):
            vac[lag] = np.mean(
                v[: nd - lag] * v[lag:], axis=(0, 1)
            )
        return vac, nc

    def postprocess(self, session):
        vac, nc = self._vac()
        dt_sample = self.dt * self.sample_interval
        dt_ps = dt_sample * TIME_UNIT_CONVERSION / 1000.0
        # natural velocity^2 -> A^2/ps^2
        v2unit = (1000.0 / TIME_UNIT_CONVERSION) ** 2
        sdc = np.zeros_like(vac)
        for lag in range(1, nc):
            sdc[lag] = sdc[lag - 1] + (vac[lag - 1] + vac[lag]) * 0.5 * dt_ps
        with open(os.path.join(session.workdir, "sdc.out"), "a") as f:
            for i in range(nc):
                row = [i * dt_ps, *(vac[i] * v2unit), *(sdc[i] * v2unit)]
                f.write(" ".join(f"{x:g}" for x in row) + "\n")


class DOS:
    """compute_dos sample_interval Nc max_omega [num_dos_points n]
    -> mvac.out + dos.out (mass-weighted VAC, discrete cosine transform;
    ref: dos.cu). max_omega in THz (omega = 2 pi nu)."""

    needs_heat = False

    def __init__(self, sample_interval, nc, max_omega_thz, dt, num_points=None):
        self.sample_interval = int(sample_interval)
        self.nc = int(nc)
        self.max_omega = float(max_omega_thz)
        self.num_points = int(num_points) if num_points else int(nc)
        self.dt = dt
        self.interval = self.sample_interval
        self.frames: List[np.ndarray] = []
        self.masses: Optional[np.ndarray] = None

    def sample_state(self, session, state, step):
        n = session._n
        if self.masses is None:
            self.masses = np.asarray(state.mass)[:n].copy()
        self.frames.append(np.asarray(state.velocity)[:n].copy())

    def postprocess(self, session):
        v = np.stack(self.frames)  # (Nd, N, 3)
        nd = len(v)
        nc = min(self.nc, nd)
        m = self.masses[None, :, None]
        vac = np.zeros((nc, 3))
        for lag in range(nc):
            vac[lag] = np.mean(m * v[: nd - lag] * v[lag:], axis=(0, 1))
        vac /= vac[0].sum() / 3.0  # normalized (mvac convention)
        dt_sample_ps = self.dt * self.sample_interval * TIME_UNIT_CONVERSION / 1000.0
        t = np.arange(nc) * dt_sample_ps
        with open(os.path.join(session.workdir, "mvac.out"), "a") as f:
            for i in range(nc):
                f.write(" ".join(f"{x:g}" for x in (t[i], *vac[i])) + "\n")
        omega = np.linspace(
            self.max_omega / self.num_points, self.max_omega, self.num_points
        )  # THz angular
        # DCT with Hann window, normalized to 3N per direction integral
        hann = 0.5 * (np.cos(np.pi * np.arange(nc) / nc) + 1.0)
        dos = np.zeros((self.num_points, 3))
        n3 = session._n
        for w_i, w in enumerate(omega):
            c = np.cos(w * t) * hann
            dos[w_i] = 2.0 * dt_sample_ps * np.sum(vac * c[:, None], axis=0) * n3
        with open(os.path.join(session.workdir, "dos.out"), "a") as f:
            for i in range(self.num_points):
                f.write(" ".join(f"{x:g}" for x in (omega[i], *dos[i])) + "\n")


def stress_6(state):
    """Total stress tensor components (xx yy zz xy xz yz), eV (virial +
    kinetic), for Green-Kubo viscosity (ref: viscosity.cu)."""
    import jax.numpy as jnp

    m = state.mask
    kin = jnp.einsum("n,na,nb->ab", state.mass * m, state.velocity, state.velocity)
    w = jnp.einsum("nab,n->ab", state.virial, m)
    s = kin + w
    return jnp.stack(
        [s[0, 0], s[1, 1], s[2, 2], s[0, 1], s[0, 2], s[1, 2]]
    )


class Viscosity:
    """compute_viscosity sample_interval Nc -> viscosity.out:
    stress autocorrelation and running shear viscosity via Green-Kubo
    eta = V/(kB T) int <s(0) s(t)> dt (ref: src/measure/viscosity.cu)."""

    needs_heat = False
    needs_stress = True

    def __init__(self, sample_interval, nc, dt, temperature):
        self.sample_interval = int(sample_interval)
        self.nc = int(nc)
        self.dt = dt
        self.temperature = temperature
        self.interval = self.sample_interval
        self.samples: List[np.ndarray] = []

    def consume_stress(self, s6_rows, first_global_step):
        steps = first_global_step + 1 + np.arange(len(s6_rows))
        sel = (steps % self.sample_interval) == 0
        if sel.any():
            self.samples.append(s6_rows[sel])

    def postprocess(self, session):
        s = np.concatenate(self.samples, axis=0)  # (Nd, 6)
        # remove mean of diagonal components (pressure offset)
        s = s - s.mean(axis=0, keepdims=True)
        nd = len(s)
        nc = min(self.nc, nd)
        corr = np.zeros((nc, 6))
        for lag in range(nc):
            corr[lag] = np.mean(s[: nd - lag] * s[lag:], axis=0)
        dt_sample = self.dt * self.sample_interval
        volume = float(session.state.box.volume)
        # eta in Pa s: natural -> SI via KAPPA-style factor; report in
        # eV ps / A^3 * 1.602e3 = mPa s? Use GPUMD unit: Pa s x 1e3.
        factor = (
            dt_sample / (K_B * self.temperature * volume)
        )
        run = np.zeros_like(corr)
        for lag in range(1, nc):
            run[lag] = run[lag - 1] + 0.5 * (corr[lag - 1] + corr[lag]) * factor
        # natural viscosity unit -> Pa s: eV * (natural time) / A^3
        # = 1.602177e-19 J * 1.018051e-14 s / 1e-30 m^3 = 1.6311e3 Pa s
        nat_to_pas = 1.602177e-19 * 1.018051e-14 / 1e-30
        run *= nat_to_pas
        dt_ps = dt_sample * TIME_UNIT_CONVERSION / 1000.0
        with open(os.path.join(session.workdir, "viscosity.out"), "a") as f:
            for lag in range(nc):
                row = [lag * dt_ps, *corr[lag], *run[lag]]
                f.write(" ".join(f"{x:g}" for x in row) + "\n")


class SHC:
    """compute_shc sample_interval Nc direction num_omega max_omega
    [group method id] -> shc.out (ref: src/measure/shc.cu).

    K(t) = <sum_{i in group} W_i[dir, :2] . v_i[:2](t)> (in-plane, ki) and
    the out-of-plane ko; +-Nc lags, Hann window, cosine transform to
    shc_i/o(omega).
    """

    needs_heat = False
    needs_atom_virial = True  # samples W_i rows; dense path must not spread

    def __init__(self, sample_interval, nc, direction, num_omega, max_omega,
                 dt, group_mask=None):
        self.sample_interval = int(sample_interval)
        self.nc = int(nc)
        self.direction = int(direction)
        self.num_omega = int(num_omega)
        self.max_omega = float(max_omega)
        self.dt = dt
        self.group_mask = group_mask  # (N,) numpy or None
        self.interval = self.sample_interval
        self.s_frames: List[np.ndarray] = []
        self.v_frames: List[np.ndarray] = []

    # ---- on-device accumulation (compact fast path) ----------------------
    #
    # The reference processes SHC per step on-GPU with ring buffers of the
    # group's per-atom (s, v) and accumulates +-Nc-lag correlation sums
    # (ref: src/measure/shc.cu, shc.cuh:26-75).  The TPU equivalent carries
    # the ring buffers in the scan: per sampled step one (Nc, G, 3) x (G, 3)
    # contraction per direction updates all lags at once on the MXU —
    # no host sync, and the chunk size no longer collapses to
    # sample_interval.  Correlation pairs match the host sample_state/
    # postprocess path exactly (mean over t of sum_i s_i(t) v_i(t+lag)).

    def device_init(self, session, n):
        import jax.numpy as jnp

        self.n = int(n)
        if self.group_mask is not None:
            gidx = np.nonzero(np.asarray(self.group_mask)[:n] > 0)[0]
        else:
            gidx = np.arange(n)
        self._gidx = jnp.asarray(gidx.astype(np.int32))
        g = len(gidx)
        nc = self.nc
        return {
            "step": jnp.zeros((), jnp.int32),
            "count": jnp.zeros((), jnp.int32),
            "s_ring": jnp.zeros((nc, g, 3), jnp.float32),
            "v_ring": jnp.zeros((nc, g, 3), jnp.float32),
            "kpos": jnp.zeros((nc, 3), jnp.float32),
            "kneg": jnp.zeros((nc, 3), jnp.float32),
            "nvalid": jnp.zeros((nc,), jnp.int32),
        }

    def device_update(self, macc, state, orig_id):
        import jax
        import jax.numpy as jnp

        nc = self.nc

        def sample(m):
            n_slots = orig_id.shape[0]
            inv = jnp.zeros(self.n + 1, jnp.int32).at[orig_id].set(
                jnp.arange(n_slots, dtype=jnp.int32), mode="drop"
            )
            slots = inv[self._gidx]
            rdt = m["s_ring"].dtype
            s_now = state.virial[slots][:, self.direction, :].astype(rdt)
            v_now = state.velocity[slots].astype(rdt)  # (G, 3)
            pos = m["count"] % nc
            s_ring = m["s_ring"].at[pos].set(s_now)
            v_ring = m["v_ring"].at[pos].set(v_now)
            # d[l, c] = sum_g s(ring l) v(now); e[l, c] = sum_g s(now) v(ring l)
            hi = jax.lax.Precision.HIGHEST
            d = jnp.einsum("lgc,gc->lc", s_ring, v_now, precision=hi)
            e = jnp.einsum("gc,lgc->lc", s_now, v_ring, precision=hi)
            lags = jnp.arange(nc)
            slot_for_lag = (pos - lags) % nc
            valid = lags <= m["count"]
            return {
                "step": m["step"],
                "count": m["count"] + 1,
                "s_ring": s_ring,
                "v_ring": v_ring,
                "kpos": m["kpos"]
                + jnp.where(valid[:, None], d[slot_for_lag], 0.0),
                "kneg": m["kneg"]
                + jnp.where(valid[:, None], e[slot_for_lag], 0.0),
                "nvalid": m["nvalid"] + valid.astype(jnp.int32),
            }

        do = (macc["step"] + 1) % self.sample_interval == 0
        out = jax.lax.cond(do, sample, lambda m: m, macc)
        return dict(out, step=macc["step"] + 1)

    def device_postprocess(self, session, macc):
        kpos = np.asarray(macc["kpos"], np.float64)
        kneg = np.asarray(macc["kneg"], np.float64)
        nvalid = np.asarray(macc["nvalid"], np.float64)
        nc = int(np.count_nonzero(nvalid))
        if nc == 0:
            return
        cnt = np.maximum(nvalid[:nc], 1.0)[:, None]
        kp = kpos[:nc] / cnt
        kn = kneg[:nc] / cnt
        ki_pos, ko_pos = kp[:, 0] + kp[:, 1], kp[:, 2]
        ki_neg, ko_neg = kn[:, 0] + kn[:, 1], kn[:, 2]
        ki = np.concatenate([ki_neg[::-1][:-1], ki_pos])
        ko = np.concatenate([ko_neg[::-1][:-1], ko_pos])
        self._write_out(session, ki, ko, nc)

    def sample_state(self, session, state, step):
        n = session._n
        w = np.asarray(state.virial)[:n]  # (N, 3, 3)
        v = np.asarray(state.velocity)[:n]
        if self.group_mask is not None:
            sel = np.asarray(self.group_mask)[:n] > 0
            w, v = w[sel], v[sel]
        self.s_frames.append(w[:, self.direction, :].copy())
        self.v_frames.append(v.copy())

    def postprocess(self, session):
        if not self.s_frames:  # device path already wrote, or no samples
            return
        s = np.stack(self.s_frames)  # (Nd, G, 3)
        v = np.stack(self.v_frames)
        nd = len(s)
        nc = min(self.nc, nd)
        # component split: in-plane = the two components != direction's z?
        # reference: ki = sx vx + sy vy, ko = sz vz (x/y/z of the virial row)
        ki_pos = np.zeros(nc)
        ko_pos = np.zeros(nc)
        ki_neg = np.zeros(nc)
        ko_neg = np.zeros(nc)
        for lag in range(nc):
            a_s = s[: nd - lag]
            b_v = v[lag:]
            ki_pos[lag] = np.mean(
                np.sum(a_s[..., 0] * b_v[..., 0] + a_s[..., 1] * b_v[..., 1],
                       axis=1), axis=0)
            ko_pos[lag] = np.mean(
                np.sum(a_s[..., 2] * b_v[..., 2], axis=1), axis=0)
            a_s2 = s[lag:]
            b_v2 = v[: nd - lag]
            ki_neg[lag] = np.mean(
                np.sum(a_s2[..., 0] * b_v2[..., 0] + a_s2[..., 1] * b_v2[..., 1],
                       axis=1), axis=0)
            ko_neg[lag] = np.mean(
                np.sum(a_s2[..., 2] * b_v2[..., 2], axis=1), axis=0)
        # assemble t = -(Nc-1)..(Nc-1)
        ki = np.concatenate([ki_neg[::-1][:-1], ki_pos])
        ko = np.concatenate([ko_neg[::-1][:-1], ko_pos])
        self._write_out(session, ki, ko, nc)

    def _write_out(self, session, ki, ko, nc):
        # natural velocity -> A/ps
        vel_unit = 1000.0 / TIME_UNIT_CONVERSION
        ki = ki * vel_unit
        ko = ko * vel_unit
        dt_ps = self.dt * self.sample_interval * TIME_UNIT_CONVERSION / 1000.0
        t = (np.arange(2 * nc - 1) - (nc - 1)) * dt_ps
        # Hann window + cosine transform (shc.cu:350-395)
        hann = 0.5 * (np.cos(np.pi * (np.arange(2 * nc - 1) + 1 - nc) / nc) + 1.0)
        kiw = ki * hann
        kow = ko * hann
        d_omega = self.max_omega / self.num_omega
        omega = (np.arange(self.num_omega) + 1) * d_omega
        shc_i = 2.0 * dt_ps * np.array(
            [np.sum(kiw * np.cos(w * t)) for w in omega]
        )
        shc_o = 2.0 * dt_ps * np.array(
            [np.sum(kow * np.cos(w * t)) for w in omega]
        )
        h = np.asarray(session.state.box.h)
        with open(os.path.join(session.workdir, "shc.out"), "a") as f:
            f.write(
                f"# compute_shc {self.sample_interval} {self.nc} "
                f"{self.direction} {self.num_omega} {self.max_omega:g}\n"
                "# format_version 1\n"
                f"# num_atoms {session._n}\n"
                "# cell " + " ".join(f"{x:.10e}" for x in h.T.ravel()) + "\n"
                f"# dt_output {dt_ps:.10e} ps\n"
                f"# num_correlation_rows {2 * nc - 1}\n"
                f"# num_frequency_rows {self.num_omega}\n"
                "# columns_correlation time_ps ki ko\n"
                "# columns_shc omega_THz shc_i shc_o\n"
            )
            for i in range(2 * nc - 1):
                f.write(f"{t[i]:g} {ki[i]:g} {ko[i]:g}\n")
            for i in range(self.num_omega):
                f.write(f"{omega[i]:g} {shc_i[i]:g} {shc_o[i]:g}\n")


class RDF:
    """compute_rdf r_cut num_bins sample_interval -> rdf.out
    (ref: rdf.cu:215-330): columns radius, total g(r), then one column per
    unordered type pair a-b in type order, like the reference header
    '#radius total A-A A-B B-B'."""

    needs_heat = False

    def __init__(self, r_cut, num_bins, sample_interval, num_types=1,
                 type_names=None):
        self.r_cut = float(r_cut)
        self.num_bins = int(num_bins)
        self.sample_interval = int(sample_interval)
        self.num_types = int(num_types)
        self.type_names = list(type_names or [])
        self.interval = self.sample_interval
        self.pairs = [
            (a, b)
            for a in range(self.num_types)
            for b in range(a, self.num_types)
        ]
        self.hist = np.zeros(self.num_bins)
        self.hist_pair = np.zeros((len(self.pairs), self.num_bins))
        self.n_samples = 0
        self.density = None
        self.type_counts = None

    def sample_state(self, session, state, step):
        import jax
        import jax.numpy as jnp

        from gpumd_tpu.neighbor.neighbor import build_neighbor_list
        from gpumd_tpu.model.box import num_replicas_for_cutoff

        n = session._n
        pos = state.position[:n]
        box = state.box
        types = np.asarray(state.type)[:n]
        reps = num_replicas_for_cutoff(box, self.r_cut)
        # O(N) cell list when the box allows it; only (num_bins,) scalars
        # reach the host (the (N, MN) pair set used to round-trip)
        nbr = build_neighbor_list(
            pos, box, state.mask[:n], rc=self.r_cut, mn=1024, reps=reps
        )
        nbins = self.num_bins

        @jax.jit
        def hist1d(r12, mask, idx, types_d):
            d = jnp.sqrt(jnp.sum(r12**2, axis=-1))
            ri = jnp.clip(
                jnp.floor(d / self.r_cut * nbins).astype(jnp.int32),
                0, nbins - 1,
            )
            ok = (mask > 0) & (d < self.r_cut)
            h = jnp.bincount(
                jnp.where(ok, ri, nbins).reshape(-1), length=nbins + 1
            )[:nbins]
            hp = []
            if self.num_types > 1:
                ti = types_d[:, None] * jnp.ones_like(idx)
                tj = types_d[idx % types_d.shape[0]]  # images fold back
                for a, b in self.pairs:
                    sel = ok & (
                        ((ti == a) & (tj == b)) | ((ti == b) & (tj == a))
                    )
                    hp.append(jnp.bincount(
                        jnp.where(sel, ri, nbins).reshape(-1),
                        length=nbins + 1,
                    )[:nbins])
            return h, hp

        h, hp = hist1d(nbr.r12, nbr.mask, nbr.idx, jnp.asarray(types))
        self.hist += np.asarray(h)
        for k in range(len(hp)):
            self.hist_pair[k] += np.asarray(hp[k])
        self.n_samples += 1
        if self.density is None:
            self.density = n / float(box.volume)
            self.type_counts = np.array(
                [(types == t).sum() for t in range(self.num_types)]
            )

    def postprocess(self, session):
        n = session._n
        dr = self.r_cut / self.num_bins
        r = (np.arange(self.num_bins) + 0.5) * dr
        shell = 4.0 * np.pi * r**2 * dr
        vol = n / self.density
        ns = max(self.n_samples, 1)
        g = self.hist / ns / n / (shell * self.density)
        gp = []
        for k, (a, b) in enumerate(self.pairs):
            na = max(self.type_counts[a], 1) if self.type_counts is not None else n
            nb = max(self.type_counts[b], 1) if self.type_counts is not None else n
            # ordered-pair count / (N_a N_b / V) per shell; a != b counts
            # both directions -> halve
            norm = 1.0 if a == b else 0.5
            gp.append(self.hist_pair[k] * norm * vol / (ns * na * nb * shell))
        with open(os.path.join(session.workdir, "rdf.out"), "a") as f:
            if self.num_types > 1:
                names = self.type_names or [str(t) for t in range(self.num_types)]
                head = " ".join(
                    f"{names[a]}-{names[b]}" for a, b in self.pairs
                )
                f.write(f"#radius total {head}\n")
            for i in range(self.num_bins):
                cols = f"{r[i]:.5f} {g[i]:.5f}"
                if self.num_types > 1:
                    cols += "".join(f" {gk[i]:.5f}" for gk in gp)
                f.write(cols + "\n")


def onsager_flux(state, mass_type, num_types):
    """Per-step HNEMDEC fluxes: 3-component energy current
    J = (E_i I + W_i) v_i summed over atoms, then per-type mass fluxes
    m_t sum_{i in t} v_i (ref: hnemdec_kappa.cu:85-148,
    compute_heat.cu:133-166)."""
    import jax.numpy as jnp

    w = state.virial
    v = state.velocity
    m = state.mask
    e_i = (
        0.5 * state.mass * jnp.sum(v**2, axis=-1) + state.potential_energy
    )
    j = jnp.einsum("nab,nb->na", w, v) + e_i[:, None] * v
    heat = jnp.sum(j * m[:, None], axis=0)  # (3,)
    mt = jnp.asarray(mass_type, v.dtype)
    parts = []
    for t in range(num_types):
        sel = (state.type == t) & (m > 0)
        parts.append(mt[t] * jnp.sum(jnp.where(sel[:, None], v, 0.0), axis=0))
    return jnp.concatenate([heat] + parts)  # (3 + 3T,)


class HNEMDECOnsager:
    """compute_hnemdec <mode> <output_interval> fe_x fe_y fe_z ->
    onsager.out (ref: hnemdec_kappa.cu:155-241)."""

    needs_onsager = True

    def __init__(self, mode, output_interval, fe, temperature, num_types,
                 factor):
        self.mode = int(mode)
        self.output_interval = int(output_interval)
        self.fe = np.asarray(fe, dtype=float)
        self.fe_mag = float(np.linalg.norm(self.fe))
        self.temperature = float(temperature)
        self.num_types = int(num_types)
        self.factor = float(factor)  # FACTOR normalization
        self.interval = self.output_interval
        self._acc = np.zeros(3 + 3 * num_types)
        self._count = 0

    def consume_onsager(self, rows, first_global_step):
        self._acc += rows.sum(axis=0)
        self._count += len(rows)

    def maybe_output(self, session):
        from gpumd_tpu.units import KAPPA_UNIT_CONVERSION

        # natural -> 1e-6 kg/smK and 1e-12 kgs/m^3K (ref constants)
        _MASSFLUX = 1631.0961499964144
        _MASSMASS = 16.905134572911963
        while self._count >= self.output_interval:
            volume = float(session.state.box.volume)
            denom = (
                self.output_interval * volume * self.temperature * self.fe_mag
            )
            if self.mode == 0:
                f1 = KAPPA_UNIT_CONVERSION / denom
                f2 = _MASSFLUX * self.factor / denom
            else:
                f1 = _MASSFLUX * self.factor / denom
                f2 = _MASSMASS * self.factor / denom
            cols = list(self._acc[:3] * f1) + list(self._acc[3:] * f2)
            with open(os.path.join(session.workdir, "onsager.out"), "a") as f:
                f.write("".join(f"{x:25.15f}" for x in cols) + "\n")
            self._acc[:] = 0.0
            self._count -= self.output_interval

    def postprocess(self, session):
        pass


class AngularRDF:
    """compute_angular_rdf r_cut r_bins theta_bins interval [a b]...
    -> angular_rdf.out (ref: angular_rdf.cu:60-660): g(r, theta) with
    theta = atan2(y12, x12) the in-plane bond azimuth, bin volume =
    shell_volume * dtheta/2pi; per-pair columns use the reference's
    symmetrized 1/(N_a rho_b) + 1/(N_b rho_a) normalization."""

    needs_heat = False

    def __init__(self, r_cut, r_bins, theta_bins, sample_interval,
                 pairs=()):
        self.r_cut = float(r_cut)
        self.r_bins = int(r_bins)
        self.t_bins = int(theta_bins)
        self.interval = int(sample_interval)
        self.pairs = [tuple(p) for p in pairs]
        self.hist = np.zeros((self.r_bins, self.t_bins))
        self.hist_pair = np.zeros((len(self.pairs), self.r_bins, self.t_bins))
        self.n_samples = 0
        self.density = None
        self.type_counts = None

    def sample_state(self, session, state, step):
        import jax
        import jax.numpy as jnp

        from gpumd_tpu.model.box import num_replicas_for_cutoff
        from gpumd_tpu.neighbor.neighbor import build_neighbor_list

        n = session._n
        pos = state.position[:n]
        box = state.box
        types = np.asarray(state.type)[:n]
        reps = num_replicas_for_cutoff(box, self.r_cut)
        # O(N) cell list when the box allows it; brute + images only for
        # small/thin boxes (ref: adf.cu/angular_rdf.cu use the cell list)
        nbr = build_neighbor_list(
            pos, box, state.mask[:n], rc=self.r_cut, mn=1024, reps=reps
        )

        # device-side 2D histogram: bucketize r/theta to a flat bin index
        # and bincount — only (r_bins x t_bins) scalars reach the host
        # (the previous host histogram moved the whole (N, MN) pair set).
        nbins = self.r_bins * self.t_bins

        @jax.jit
        def hist2d(r12, mask, idx, types_d):
            d = jnp.sqrt(jnp.sum(r12**2, axis=-1))
            theta = jnp.arctan2(r12[..., 1], r12[..., 0])
            ri = jnp.floor(d / self.r_cut * self.r_bins).astype(jnp.int32)
            tiq = jnp.floor(
                (theta + np.pi) / (2 * np.pi) * self.t_bins
            ).astype(jnp.int32)
            ri = jnp.clip(ri, 0, self.r_bins - 1)
            tiq = jnp.clip(tiq, 0, self.t_bins - 1)
            flat = ri * self.t_bins + tiq
            ok = (mask > 0) & (d < self.r_cut)
            h = jnp.bincount(
                jnp.where(ok, flat, nbins).reshape(-1), length=nbins + 1
            )[:nbins]
            ti = types_d[:, None] * jnp.ones_like(idx)
            tj = types_d[idx % types_d.shape[0]]
            hp = []
            for a, b in self.pairs:
                sel = ok & (((ti == a) & (tj == b)) | ((ti == b) & (tj == a)))
                hp.append(jnp.bincount(
                    jnp.where(sel, flat, nbins).reshape(-1),
                    length=nbins + 1,
                )[:nbins])
            return h, hp

        h, hp = hist2d(nbr.r12, nbr.mask, nbr.idx, jnp.asarray(types))
        self.hist += np.asarray(h).reshape(self.r_bins, self.t_bins)
        for k in range(len(self.pairs)):
            self.hist_pair[k] += np.asarray(hp[k]).reshape(
                self.r_bins, self.t_bins
            )
        self.n_samples += 1
        if self.density is None:
            self.density = n / float(box.volume)
            nt = int(types.max()) + 1 if n else 1
            self.type_counts = np.array(
                [(types == t).sum() for t in range(nt)]
            )

    def postprocess(self, session):
        n = session._n
        dr = self.r_cut / self.r_bins
        r_lo = np.arange(self.r_bins) * dr
        r_up = r_lo + dr
        shell = 4.0 / 3.0 * np.pi * (r_up**3 - r_lo**3)
        bin_vol = shell[:, None] * (1.0 / self.t_bins)  # dtheta/2pi
        r_c = r_lo + 0.5 * dr
        t_c = -np.pi + (np.arange(self.t_bins) + 0.5) * (2 * np.pi / self.t_bins)
        ns = max(self.n_samples, 1)
        vol = n / self.density
        g = self.hist / (ns * n * self.density * bin_vol)
        gps = []
        for k, (a, b) in enumerate(self.pairs):
            na = max(self.type_counts[a], 1)
            nb = max(self.type_counts[b], 1)
            # both-direction counts; reference accumulates each direction
            # with 1/(N_row rho_col) (angular_rdf.cu:228-236)
            if a == b:
                norm = vol / (na * nb)
            else:
                norm = vol / (na * nb)  # 2 directions x V/(2 Na Nb)
            gps.append(self.hist_pair[k] * norm / (ns * bin_vol))
        with open(os.path.join(session.workdir, "angular_rdf.out"), "a") as f:
            f.write("#radius theta total" + "".join(
                f" type_{a}_{b}" for a, b in self.pairs) + "\n")
            for i in range(self.r_bins):
                for j in range(self.t_bins):
                    row = f"{r_c[i]:.5f} {t_c[j]:.5f} {g[i, j]:.5f}"
                    for gp in gps:
                        row += f" {gp[i, j]:.5f}"
                    f.write(row + "\n")


class ADF:
    """compute_adf: bond-angle distribution -> adf.out (ref: adf.cu).

    Global form: compute_adf interval bins rc_min rc_max — histogram of
    angles j-i-k over all triples with both bond lengths inside
    [rc_min, rc_max), bins over [0, 180) degrees, normalized to unit area.

    Triple form: compute_adf interval bins (i j k rcmin_j rcmax_j rcmin_k
    rcmax_k)xM — per-(itype, jtype, ktype) histograms with independent
    bond windows, one output column per triple.
    """

    def __init__(self, sample_interval, num_bins, rc_min=None, rc_max=None,
                 triples=None):
        self.sample_interval = int(sample_interval)
        self.interval = self.sample_interval
        self.num_bins = int(num_bins)
        self.global_ = triples is None
        self.rc_min = float(rc_min) if rc_min is not None else 0.0
        self.rc_max = float(rc_max) if rc_max is not None else 0.0
        self.triples = triples or []
        ncol = 1 if self.global_ else len(self.triples)
        self.hist = np.zeros((ncol, self.num_bins))
        self.n_samples = 0
        self.last_step = 0

    def _rc_top(self):
        if self.global_:
            return self.rc_max
        return max(max(t[4], t[6]) for t in self.triples)

    def sample_state(self, session, state, step):
        import jax
        import jax.numpy as jnp

        from gpumd_tpu.model.box import num_replicas_for_cutoff
        from gpumd_tpu.neighbor.neighbor import build_neighbor_list

        n = session._n
        pos = state.position[:n]
        box = state.box
        types = jnp.asarray(state.type)[:n]
        rc = self._rc_top()
        reps = num_replicas_for_cutoff(box, rc)
        # O(N) cell list when the box allows it (ref: adf.cu cell list)
        nbr = build_neighbor_list(
            pos, box, state.mask[:n], rc=rc, mn=96, reps=reps
        )
        nb = self.num_bins
        ncol = 1 if self.global_ else len(self.triples)

        # device-side: the (N, MN, MN) triple-angle tensor never leaves the
        # device (9e9 elements at 1M atoms on the host before); angles are
        # bucketized and bincounted per atom chunk under lax.map.
        @jax.jit
        def hists(r12, mask, idx, types_d):
            nn = r12.shape[0]
            block = 2048
            npad = -(-nn // block) * block
            mn = r12.shape[1]
            r12p = jnp.pad(r12, ((0, npad - nn), (0, 0), (0, 0)))
            mp = jnp.pad(mask, ((0, npad - nn), (0, 0)))
            tip = jnp.pad(types_d, (0, npad - nn), constant_values=-1)
            tjp = jnp.pad(types_d[idx % nn], ((0, npad - nn), (0, 0)),
                          constant_values=-1)
            jk = jnp.triu(jnp.ones((mn, mn), bool), k=1)[None]

            def chunk(args):
                r12c, mc, tic, tjc = args
                d = jnp.sqrt((r12c**2).sum(-1))
                dots = jnp.einsum("nja,nka->njk", r12c, r12c)
                dd = d[:, :, None] * d[:, None, :]
                cosv = jnp.clip(dots / jnp.maximum(dd, 1e-30), -1.0, 1.0)
                theta = jnp.degrees(jnp.arccos(cosv))
                bins = jnp.clip(
                    jnp.floor(theta / 180.0 * nb).astype(jnp.int32), 0,
                    nb - 1,
                )
                out = []
                if self.global_:
                    okj = (mc > 0) & (d >= self.rc_min) & (d < self.rc_max)
                    sel = okj[:, :, None] & okj[:, None, :] & jk
                    out.append(jnp.bincount(
                        jnp.where(sel, bins, nb).reshape(-1), length=nb + 1
                    )[:nb])
                else:
                    for it, jt, kt, rmnj, rmxj, rmnk, rmxk in self.triples:
                        ci = tic == it
                        wj = (mc > 0) & (d >= rmnj) & (d < rmxj) & (tjc == jt)
                        wk = (mc > 0) & (d >= rmnk) & (d < rmxk) & (tjc == kt)
                        sel = (wj[:, :, None] & wk[:, None, :]
                               & ci[:, None, None])
                        if jt == kt:
                            sel = sel & jk
                        out.append(jnp.bincount(
                            jnp.where(sel, bins, nb).reshape(-1),
                            length=nb + 1,
                        )[:nb])
                return jnp.stack(out)

            hs = jax.lax.map(chunk, (
                r12p.reshape(-1, block, mn, 3),
                mp.reshape(-1, block, mn),
                tip.reshape(-1, block),
                tjp.reshape(-1, block, mn),
            ))
            return jnp.sum(hs, axis=0)  # (ncol, nb)

        h = np.asarray(hists(nbr.r12, nbr.mask, nbr.idx, types))
        self.hist += h
        self.n_samples += 1
        self.last_step = step

    def postprocess(self, session):
        delta = 180.0 / self.num_bins
        angles = np.arange(self.num_bins) * delta
        with open(os.path.join(session.workdir, "adf.out"), "a") as f:
            if self.global_:
                f.write(f"#angles total step = {self.last_step}\n")
                total = max(self.hist[0].sum(), 1.0)
                for i in range(self.num_bins):
                    f.write(f"{angles[i]:g} {self.hist[0, i] / (total * delta):g}\n")
            else:
                head = " ".join(
                    f"triples_{t[0]}-{t[1]}-{t[2]}" for t in self.triples
                )
                f.write(f"#angles {head} step = {self.last_step}\n")
                totals = np.maximum(self.hist.sum(axis=1), 1.0)
                for i in range(self.num_bins):
                    cols = " ".join(
                        f"{self.hist[c, i] / (totals[c] * delta):g}"
                        for c in range(len(self.triples))
                    )
                    f.write(f"{angles[i]:g} {cols}\n")


def _ylm_complex(l, theta_cos, phi):
    """Complex spherical harmonics Y_l^m for m = -l..l via the standard
    associated-Legendre recurrence (host-side numpy; l <= ~20 stable)."""
    x = theta_cos
    sx = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    # P_m^m upward in m, then P_l^m upward in l
    out = {}
    for m in range(l + 1):
        pmm = np.ones_like(x)
        if m > 0:
            fact = 1.0
            for _ in range(m):
                pmm = -pmm * fact * sx
                fact += 2.0
        if l == m:
            plm = pmm
        else:
            pmmp1 = x * (2 * m + 1) * pmm
            if l == m + 1:
                plm = pmmp1
            else:
                for ll in range(m + 2, l + 1):
                    plm = (x * (2 * ll - 1) * pmmp1 - (ll + m - 1) * pmm) / (
                        ll - m
                    )
                    pmm, pmmp1 = pmmp1, plm
        from math import factorial

        norm = np.sqrt(
            (2 * l + 1) / (4 * np.pi) * factorial(l - m) / factorial(l + m)
        )
        y = norm * plm * np.exp(1j * m * phi)
        out[m] = y
        if m > 0:
            out[-m] = (-1) ** m * np.conj(y)
    return out


def _ylm_complex_jnp(l, theta_cos, phi):
    """Device (jnp) variant of _ylm_complex — same recurrences, complex64/
    128 arrays on the accelerator."""
    import jax.numpy as jnp
    from math import factorial

    x = theta_cos
    sx = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    out = {}
    for m in range(l + 1):
        pmm = jnp.ones_like(x)
        if m > 0:
            fact = 1.0
            for _ in range(m):
                pmm = -pmm * fact * sx
                fact += 2.0
        if l == m:
            plm = pmm
        else:
            pmmp1 = x * (2 * m + 1) * pmm
            if l == m + 1:
                plm = pmmp1
            else:
                for ll in range(m + 2, l + 1):
                    plm = (x * (2 * ll - 1) * pmmp1 - (ll + m - 1) * pmm) / (
                        ll - m
                    )
                    pmm, pmmp1 = pmmp1, plm
        norm = np.sqrt(
            (2 * l + 1) / (4 * np.pi) * factorial(l - m) / factorial(l + m)
        )
        y = norm * plm * jnp.exp(1j * m * phi)
        out[m] = y
        if m > 0:
            out[-m] = (-1) ** m * jnp.conj(y)
    return out


def _wigner3j(j1, j2, j3, m1, m2, m3):
    """Wigner 3j symbol by the Racah sum (exact for small integer j)."""
    if m1 + m2 + m3 != 0:
        return 0.0
    if abs(m1) > j1 or abs(m2) > j2 or abs(m3) > j3:
        return 0.0
    from math import factorial as f

    delta = np.sqrt(
        f(j1 + j2 - j3) * f(j1 - j2 + j3) * f(-j1 + j2 + j3)
        / float(f(j1 + j2 + j3 + 1))
    )
    pref = delta * np.sqrt(
        float(
            f(j1 - m1) * f(j1 + m1) * f(j2 - m2) * f(j2 + m2)
            * f(j3 - m3) * f(j3 + m3)
        )
    )
    tmin = max(0, j2 - j3 - m1, j1 - j3 + m2)
    tmax = min(j1 + j2 - j3, j1 - m1, j2 + m2)
    total = 0.0
    for t in range(tmin, tmax + 1):
        denom = (
            f(t) * f(j3 - j2 + t + m1) * f(j3 - j1 + t - m2)
            * f(j1 + j2 - j3 - t) * f(j1 - t - m1) * f(j2 - t + m2)
        )
        total += (-1.0) ** t / denom
    return ((-1.0) ** (j1 - j2 - m3)) * pref * total


class OrientOrder:
    """compute_orientorder: Steinhardt bond-orientational order parameters
    q_l (optionally Lechner-Dellago neighbor-averaged), third-order
    invariants w_l and normalized w_l^hat -> orientorder.out
    (ref: orientorder.cu:317-575).

    run.in: compute_orientorder <interval> cutoff <rc> | nnn <n>
            <ndegrees> <l1> <l2> ... [average] [wl] [wlhat]
    """

    def __init__(self, interval, mode, mode_param, degrees, average=False,
                 wl=False, wlhat=False, nnn_rc=6.0):
        self.interval = int(interval)
        self.mode = mode  # "cutoff" | "nnn"
        self.rc = float(mode_param) if mode == "cutoff" else float(nnn_rc)
        self.nnn = int(mode_param) if mode == "nnn" else 0
        self.degrees = [int(d) for d in degrees]
        self.average = bool(average)
        self.wl = bool(wl)
        self.wlhat = bool(wlhat)
        self.blocks = []  # (step, qnarray rows)

    def sample_state(self, session, state, step):
        import jax
        import jax.numpy as jnp

        from gpumd_tpu.model.box import num_replicas_for_cutoff
        from gpumd_tpu.neighbor.neighbor import build_neighbor_list

        n = session._n
        pos = state.position[:n]
        box = state.box
        reps = num_replicas_for_cutoff(box, self.rc)
        # O(N) cell list when the box allows it (ref: orientorder.cu)
        nbr = build_neighbor_list(
            pos, box, state.mask[:n], rc=self.rc, mn=96, reps=reps
        )

        # device-side Steinhardt pipeline (only the per-atom q/w columns
        # reach the host); wigner-3j constants stay host-side (tiny).
        wig = {}
        if self.wl or self.wlhat:
            for l in set(self.degrees):
                terms = []
                for m1 in range(-l, l + 1):
                    for m2 in range(-l, l + 1):
                        m3 = -(m1 + m2)
                        if abs(m3) > l:
                            continue
                        cg = _wigner3j(l, l, l, m1, m2, m3)
                        if cg != 0.0:
                            terms.append((m1, m2, m3, cg))
                wig[l] = terms

        @jax.jit
        def compute_cols(r12, mask, idx):
            m = mask > 0
            d = jnp.sqrt((r12**2).sum(-1))
            if self.nnn > 0:
                dd = jnp.where(m, d, jnp.inf)
                order = jnp.argsort(dd, axis=1)
                keep = jnp.zeros(m.shape, bool)
                rows = jnp.arange(m.shape[0])[:, None]
                keep = keep.at[rows, order[:, : self.nnn]].set(True)
                m = m & keep
            nb_count = m.sum(axis=1)
            ct = jnp.where(m, r12[..., 2] / jnp.maximum(d, 1e-30), 0.0)
            phi = jnp.arctan2(r12[..., 1], r12[..., 0])

            qlm = {}
            for l in set(self.degrees):
                y = _ylm_complex_jnp(l, ct, phi)
                for mm in range(-l, l + 1):
                    sv = jnp.where(m, y[mm], 0.0).sum(axis=1)
                    qlm[(l, mm)] = sv / jnp.maximum(nb_count, 1)
            if self.average:
                for l in set(self.degrees):
                    for mm in range(-l, l + 1):
                        v = qlm[(l, mm)]
                        nb_sum = jnp.where(m, v[idx % v.shape[0]], 0.0).sum(
                            axis=1
                        )
                        qlm[(l, mm)] = (v + nb_sum) / jnp.maximum(
                            nb_count + 1, 1
                        )
            cols = []
            qnorm = {}
            for l in self.degrees:
                s2 = sum(
                    jnp.abs(qlm[(l, mm)]) ** 2 for mm in range(-l, l + 1)
                )
                q = jnp.sqrt(4.0 * np.pi / (2 * l + 1) * s2)
                qnorm[l] = q
                cols.append(q)
            if self.wl or self.wlhat:
                wsums = {}
                for l in self.degrees:
                    w = 0.0
                    for m1, m2, m3, cg in wig[l]:
                        w = w + cg * jnp.real(
                            qlm[(l, m1)] * qlm[(l, m2)] * qlm[(l, m3)]
                        )
                    wsums[l] = w
                if self.wl:
                    for l in self.degrees:
                        cols.append(wsums[l])
                if self.wlhat:
                    for l in self.degrees:
                        qfac = np.sqrt(
                            4.0 * np.pi / (2 * l + 1)
                        ) / jnp.maximum(qnorm[l], 1e-30)
                        cols.append(wsums[l] * qfac**3)
            if self.nnn > 0:
                bad = nb_count < self.nnn
                cols = [jnp.where(bad, 0.0, c) for c in cols]
            return jnp.stack(cols, axis=1)

        arr = np.asarray(compute_cols(nbr.r12, nbr.mask, nbr.idx))
        self.blocks.append((step, arr))

    def postprocess(self, session):
        with open(os.path.join(session.workdir, "orientorder.out"), "a") as f:
            for step, arr in self.blocks:
                f.write(f"step = {step}\n")
                head = " ".join(f"ql{l}" for l in self.degrees)
                if self.wl:
                    head += " " + " ".join(f"wl{l}" for l in self.degrees)
                if self.wlhat:
                    head += " " + " ".join(
                        f"wlhat{l}" for l in self.degrees
                    )
                f.write(head + "\n")
                for row in arr:
                    f.write(" ".join(f"{x:f}" for x in row) + "\n")


class ModalAnalysis:
    """compute_gkma / compute_hnema: modal decomposition of the heat
    current onto normal-mode eigenvectors (ref: modal_analysis.cu:241-657).

    Reads `eigenvector.in` (binary float32: 3*Np omega^2 values in
    ascending order, then per mode [ex(Np), ey(Np), ez(Np)]).  Per sample,
    with mass-scaled modal velocity xdot_c[m] = sum_i e_c[m,i] sqrt(m_i)
    v_i,c and stress columns W[:, a, c]/sqrt(m_i):

        jm_c[m, a] = (sum_i e_c[m,i] W[i,a,c]/sqrt(m_i)) * xdot_c[m]
        jxi = jmx[:,0]+jmy[:,0]; jxo = jmz[:,0]; jyi = jmx[:,1]+jmy[:,1];
        jyo = jmz[:,1]; jz = jmx[:,2]+jmy[:,2]+jmz[:,2]

    GKMA (heatmode.out): per-sample binned modal currents (user runs the
    Green-Kubo integral offline).  HNEMA (kappamode.out): accumulates over
    samples and emits per-bin kappa scaled by
    KAPPA_UNIT_CONVERSION / (V T fe samples_per_output).
    """

    needs_atom_virial = True  # samples W_i columns per mode

    def __init__(self, method, sample_interval, first_mode, last_mode,
                 bin_size=None, f_bin_size=None, output_interval=None,
                 fe=0.0, temperature=300.0, eig_path="eigenvector.in"):
        self.method = method  # "gkma" | "hnema"
        self.sample_interval = int(sample_interval)
        self.output_interval = int(output_interval or sample_interval)
        self.interval = self.sample_interval
        self.first_mode = int(first_mode)
        self.last_mode = int(last_mode)
        self.num_modes = self.last_mode - self.first_mode + 1
        self.bin_size = bin_size
        self.f_bin_size = f_bin_size
        self.fe = fe
        self.temperature = temperature
        self.eig_path = eig_path
        self._eig = None
        self._jm_acc = None
        self._nsamp = 0

    def _load(self, n_atoms):
        raw = np.fromfile(self.eig_path, dtype=np.float32)
        np3 = 3 * n_atoms
        if raw.size < np3 * (1 + self.last_mode):
            raise ValueError(
                f"eigenvector.in too small: {raw.size} floats, need "
                f">= {np3 * (1 + self.last_mode)}"
            )
        om2 = raw[:np3]
        eig = raw[np3:np3 * (1 + self.last_mode)].reshape(-1, 3, n_atoms)
        eig = eig[self.first_mode - 1 : self.last_mode]
        self._eig = eig  # (num_modes, 3, Np)
        # binning (ref: preprocess f_flag branch)
        if self.f_bin_size is not None:
            f = np.copysign(
                np.sqrt(np.abs(om2)) / (2.0 * np.pi), om2
            )[self.first_mode - 1 : self.last_mode]
            eps = 1e-6
            fmax = (np.floor(abs(f[-1]) / self.f_bin_size) + 1) * self.f_bin_size
            fmin = np.floor(abs(f[0]) / self.f_bin_size) * self.f_bin_size
            shift = int(np.floor(abs(fmin) / self.f_bin_size + eps))
            self.num_bins = int(np.floor((fmax - fmin) / self.f_bin_size + eps))
            self._mode_bin = (
                np.abs(f / self.f_bin_size).astype(np.int64) - shift
            )
        else:
            bs = int(self.bin_size)
            self.num_bins = int(np.ceil(self.num_modes / bs))
            self._mode_bin = np.arange(self.num_modes) // bs
        self._jm_acc = np.zeros((self.num_modes, 5))

    def sample_state(self, session, state, step):
        mask = np.asarray(state.mask) > 0
        n = int(mask.sum())
        if self._eig is None:
            self._load(n)
        v = np.asarray(state.velocity)[:n]
        w = np.asarray(state.virial)[:n]  # (Np, 3, 3), J_a = W_ab v_b
        m = np.asarray(state.mass)[:n]
        sq = np.sqrt(m)
        jm_c = np.zeros((3, self.num_modes, 3))
        for c in range(3):
            e_c = self._eig[:, c, :]  # (modes, Np)
            xdot = e_c @ (sq * v[:, c])  # (modes,)
            sm = w[:, :, c] / sq[:, None]  # (Np, 3): columns W[a, c]
            jm_c[c] = (e_c @ sm) * xdot[:, None]
        jm = np.stack(
            [
                jm_c[0, :, 0] + jm_c[1, :, 0],  # jxi
                jm_c[2, :, 0],                  # jxo
                jm_c[0, :, 1] + jm_c[1, :, 1],  # jyi
                jm_c[2, :, 1],                  # jyo
                jm_c[0, :, 2] + jm_c[1, :, 2] + jm_c[2, :, 2],  # jz
            ],
            axis=1,
        )  # (modes, 5)
        if self.method == "gkma":
            self._write_bins(session, jm)
        else:
            self._jm_acc += jm
            self._nsamp += 1
            if (self._nsamp * self.sample_interval) % self.output_interval == 0:
                spo = self.output_interval // self.sample_interval
                vol = float(state.box.volume)
                factor = KAPPA_UNIT_CONVERSION / (
                    vol * self.temperature * self.fe * spo
                )
                self._write_bins(session, self._jm_acc * factor)
                self._jm_acc[:] = 0.0
                self._nsamp = 0

    def _write_bins(self, session, jm):
        out = np.zeros((self.num_bins, 5))
        np.add.at(out, self._mode_bin, jm)
        name = "heatmode.out" if self.method == "gkma" else "kappamode.out"
        f = session._file(name)
        for row in out:
            f.write(" ".join(f"{x:g}" for x in row) + "\n")
        f.flush()

    def postprocess(self, session):
        pass


class IonicConductivity:
    """compute_ic sample_int Nc type charge -> ic.out: Nernst-Einstein
    ionic conductivity from the per-type MSD derivative
    (ref: iron_conductivity.cu; factor = q^2 e / (V kB T dt) in S/cm
    units via 1.602176634e7)."""

    def __init__(self, sample_interval, nc, target_type, charge, dt,
                 temperature):
        self.sample_interval = int(sample_interval)
        self.nc = int(nc)
        self.target_type = int(target_type)
        self.charge = float(charge)
        self.dt = dt
        self.temperature = temperature
        self.interval = self.sample_interval
        self.frames: List[np.ndarray] = []
        self._volume = None

    def sample_state(self, session, state, step):
        if state.unwrapped_position is None:
            raise ValueError("compute_ic requires unwrapped positions")
        n = session._n
        sel = np.asarray(state.type)[:n] == self.target_type
        self.frames.append(
            np.asarray(state.unwrapped_position)[:n][sel].copy()
        )
        self._volume = float(state.box.volume)

    def postprocess(self, session):
        frames = np.stack(self.frames)  # (Nd, Nt, 3)
        nd = len(frames)
        nc = min(self.nc, nd)
        dt_nat = self.dt * self.sample_interval
        dt_ps = dt_nat * TIME_UNIT_CONVERSION / 1000.0
        # summed (not per-atom-averaged) squared displacement per lag
        msd = np.zeros((nc, 3))
        for lag in range(1, nc):
            d = frames[lag:] - frames[: nd - lag]
            msd[lag] = np.mean(np.sum(d * d, axis=1), axis=0)
        factor = (
            self.charge**2 * 1.602176634e7 * 0.5
            / (TIME_UNIT_CONVERSION * self._volume * K_B
               * self.temperature * dt_nat)
        )
        ic = np.zeros((nc, 3))
        ic[1:] = (msd[1:] - msd[:-1]) * factor
        with open(os.path.join(session.workdir, "ic.out"), "a") as f:
            for i in range(nc):
                f.write(
                    f"{i * dt_ps:g} {ic[i, 0]:g} {ic[i, 1]:g} {ic[i, 2]:g}\n"
                )
