"""The `gpumd` application: execute run.in against model.xyz.

Keyword-stream execution model matching the reference (ref:
src/main_gpumd/run.cu:343-575): state-mutating keywords apply immediately,
property keywords register observers, `run N` performs a run block.

    python -m gpumd_tpu.app.gpumd [workdir]

TPU-native run loop: steps execute in jit-compiled chunks whose length is
the gcd of all dump intervals; host I/O happens between chunks (the
reference launches kernels per step and writes from the host mid-loop).
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.npt import NPTBerendsen
from gpumd_tpu.integrate.ensembles.nve import NVE
from gpumd_tpu.integrate.ensembles.nvt import (
    NVTBDP,
    NVTBerendsen,
    NVTLangevin,
    NVTNoseHooverChain,
)
from gpumd_tpu.integrate.run import MDRunner
from gpumd_tpu.integrate.thermo import compute_thermo
from gpumd_tpu.integrate.velocity import correct_velocity, initialize_velocity
from gpumd_tpu.io.xyz import XYZFrame, read_xyz, write_xyz
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import MDState, make_state
from gpumd_tpu.potentials.lj import LJ
from gpumd_tpu.potentials.nep import NEP
from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION, TIME_UNIT_CONVERSION


def parse_run_in(path: str) -> List[List[str]]:
    """Tokenize run.in: whitespace tokens, '#' comments (ref: read_file.cu).
    Returns a list of keyword lines."""
    lines = []
    with open(path) as f:
        for raw in f:
            body = raw.split("#", 1)[0].strip()
            if not body:
                continue
            toks = body.split()
            if len(toks) > 32:
                raise ValueError(f"run.in line has > 32 tokens: {body!r}")
            lines.append(toks)
    return lines


@dataclass
class PropertyRequest:
    interval: int
    process: Callable  # (session, state, global_step) -> None
    finalize: Optional[Callable] = None
    # samples per-atom virials (the dense engine must not spread the total)
    needs_atom_virial: bool = False
    # writes back into session.state (plumed): list path only
    mutates_state: bool = False


# Hard cap on the per-dispatch lax.scan length.  A monolithic 20k-step
# scan at 1M atoms crashed the device worker (round-4 HNEMD kappa run);
# bounding every dispatch keeps device RPCs short so long production runs
# survive and can be interrupted/resumed.  Override via GPUMD_SCAN_BLOCK.
_MAX_SCAN_BLOCK = int(os.environ.get("GPUMD_SCAN_BLOCK", "1000"))


def _bounded_chunk(interval_gcd: int, n_steps: int) -> int:
    """Scan-block length: the observer-interval gcd, bounded by
    _MAX_SCAN_BLOCK.  When the gcd exceeds the cap, pick its largest
    divisor under the cap so chunk boundaries still land exactly on every
    observer interval."""
    chunk = max(1, min(interval_gcd, n_steps))
    if chunk <= _MAX_SCAN_BLOCK:
        return chunk
    best = 1
    for d in range(1, int(math.isqrt(chunk)) + 1):
        if chunk % d == 0:
            if d <= _MAX_SCAN_BLOCK:
                best = max(best, d)
            q = chunk // d
            if q <= _MAX_SCAN_BLOCK:
                best = max(best, q)
    return best


class Session:
    """One gpumd run: model.xyz + run.in in a working directory."""

    def __init__(self, workdir: str = ".", quiet: bool = False):
        self.workdir = workdir
        self.quiet = quiet
        if not quiet:
            # device banner (ref: the reference's GPU-info print at startup)
            devs = jax.devices()
            self.log(
                f"gpumd_tpu on {jax.default_backend()}: "
                f"{len(devs)} device(s) [{devs[0].device_kind}]"
            )
        frame = read_xyz(os.path.join(workdir, "model.xyz"))
        self.frame = frame
        self.box = Box.from_lattice(frame.lattice, pbc=frame.pbc)
        self.symbols: List[str] = frame.symbols
        self.type_names: List[str] = []
        self.potentials: list = []
        self.ff: Optional[ForceField] = None
        self.state: Optional[MDState] = None
        self.dt = 1.0 / TIME_UNIT_CONVERSION  # natural units (default 1 fs)
        self.ensemble = None
        self.drivers = []
        from gpumd_tpu.model.groups import Groups

        self.groups = Groups(frame.groups, frame.n_atoms)
        self.mobile_mask = None  # set by `fix`
        self.properties: List[PropertyRequest] = []
        self.measure_props: list = []
        self.global_step = 0
        self.velocity_initialized = False
        self._n = frame.n_atoms
        self._files: Dict[str, object] = {}

    # ------------------------------------------------------------------ utils

    def log(self, *msg):
        if not self.quiet:
            print(*msg)

    def _file(self, name: str, header: Optional[str] = None):
        if name not in self._files:
            f = open(os.path.join(self.workdir, name), "w")
            if header:
                f.write(header)
            self._files[name] = f
        return self._files[name]

    def _require_state(self):
        if self.state is None:
            raise ValueError("no potential defined yet (potential keyword)")

    def _types_from_symbols(self) -> np.ndarray:
        if not self.type_names:
            raise ValueError("potential must be declared before this keyword")
        index = {s: i for i, s in enumerate(self.type_names)}
        try:
            return np.array([index[s] for s in self.symbols])
        except KeyError as e:
            raise ValueError(f"element {e} not covered by the potential")

    # -------------------------------------------------------------- keywords

    def kw_potential(self, args):
        path = os.path.join(self.workdir, args[0])
        with open(path) as f:
            head = f.readline().split()
        name = head[0]
        if name == "lj":
            pot = LJ.from_file(path)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "tersoff_1989":
            from gpumd_tpu.potentials.tersoff import Tersoff1989

            pot = Tersoff1989.from_file(path)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "tersoff_1988":
            from gpumd_tpu.potentials.tersoff import Tersoff1988

            pot = Tersoff1988.from_file(path)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "tersoff_mini":
            from gpumd_tpu.potentials.tersoff import TersoffMini

            pot = TersoffMini.from_file(path)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "eam_zhou_2004":
            from gpumd_tpu.potentials.eam import EAMZhou2004

            pot = EAMZhou2004.from_file(path)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "adp":
            from gpumd_tpu.potentials.eam import ADP

            pot = ADP.from_file(path)
            self.type_names = list(pot.symbols)
        elif name == "eam/alloy":
            from gpumd_tpu.potentials.eam import EAMAlloy

            pot = EAMAlloy.from_file(path)
            self.type_names = list(pot.symbols)
        elif name == "eam_dai_2006":
            from gpumd_tpu.potentials.eam import EAMDai2006

            pot = EAMDai2006.from_file(path)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "dp":
            from gpumd_tpu.potentials.dp import DP

            pot = DP.from_file(path, workdir=self.workdir)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "nnap":
            raise RuntimeError(
                "nnap requires the external Java NNAP runtime (the "
                "reference gates it behind USE_NNAP + a JVM, nnap.cu:21); "
                "it is not bridged in this build"
            )
        elif name in ("tersoff_ilp", "nep_ilp", "sw_ilp"):
            from gpumd_tpu.potentials.ilp import (
                load_nep_ilp, load_sw_ilp, load_tersoff_ilp,
            )

            if len(args) < 2:
                raise ValueError(f"{name} needs two potential files")
            path2 = os.path.join(self.workdir, args[1])
            self.type_names = head[2 : 2 + int(head[1])]
            # parse the group method from the ILP file, then bind labels
            if name == "tersoff_ilp":
                pot, gm_ilp = load_tersoff_ilp(
                    path, path2,
                    np.zeros(self._n, np.int32),
                )
            elif name == "sw_ilp":
                pot, gm_ilp = load_sw_ilp(
                    path, path2, np.zeros(self._n, np.int32),
                )
            else:
                pot, gm_ilp, gm_nep, nep_map = load_nep_ilp(
                    path, path2, np.zeros(self._n, np.int32),
                    workdir=self.workdir,
                )
                if nep_map is not None:
                    gids = np.asarray(self.groups.labels)[:, gm_nep]
                    pot = pot._replace(
                        nep_labels=jnp.asarray(nep_map[gids], jnp.int32)
                    )
            labels = np.asarray(self.groups.labels)[:, gm_ilp]
            pot = pot._replace(ilp=pot.ilp._replace(
                labels=jnp.asarray(labels, jnp.int32)
            ))
        elif name == "sw_1985":
            from gpumd_tpu.potentials.sw import SW

            pot = SW.from_file(path)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name == "fcp":
            from gpumd_tpu.potentials.fcp import FCP

            pot = FCP.from_file(path, workdir=self.workdir)
            pot = pot.attach_box(self.box)
            self.type_names = head[2 : 2 + int(head[1])]
        elif name.startswith("nep") and "charge" in name:
            from gpumd_tpu.potentials.nep.charge import NEPCharge

            pot = NEPCharge.from_file(path)
            if getattr(self, "_kspace_method", None):
                pot = pot._replace(kspace_method=self._kspace_method)
            from gpumd_tpu.potentials.nep.pppm import best_mesh

            pot = pot._replace(pppm_mesh=best_mesh(self.box))
            self.type_names = list(pot.model.symbols)
        elif name.startswith("nep"):
            pot = NEP.from_file(path)
            # foundation models (nep89): slice the type tables down to the
            # species present in model.xyz so the T^2-unrolled fast engines
            # stay open (identical numerics; ref nep.cu:100-395 carries the
            # full table into the kernel instead)
            present = set(self.symbols)
            if 0 < len(present & set(pot.model.symbols)) < pot.model.num_types \
                    and present <= set(pot.model.symbols):
                pot = pot.restrict(sorted(
                    present, key=list(pot.model.symbols).index))
            self.type_names = list(pot.model.symbols)
        else:
            raise ValueError(f"unsupported potential type {name!r}")
        self.potentials.append(pot)
        self.observer_mode = getattr(self, "observer_mode", "observe")
        types = self._types_from_symbols()
        state = make_state(
            self.frame.positions,
            self.frame.default_masses(),
            types,
            self.box,
            velocity=(
                self.frame.velocities * TIME_UNIT_CONVERSION
                if self.frame.velocities is not None
                else None
            ),
            n_pad=self._n,
            track_unwrapped=True,
        )
        if self.state is not None:  # keep velocities etc. from prior state
            state = state._replace(velocity=self.state.velocity)
        self.state = state
        self._rebuild_ff()
        self.log(f"potential: {name} ({path})")

    def _rebuild_ff(self):
        # Multiple potentials: reference semantics are NEP-only 'observe'
        # (first drives, rest observed by dump_observer) or 'average'
        # (forces averaged) — ref: force.cu:211-217, dump_observer.cuh.
        mode = getattr(self, "observer_mode", "observe")
        if len(self.potentials) > 1 and mode == "observe":
            driving = [self.potentials[0]]
        else:
            driving = list(self.potentials)
        ff = ForceField.create(
            driving, self.box, self._n,
            mn=_auto_mn(self.potentials, self._n, self.box),
            skin=1.0,
        )
        if len(driving) > 1 and mode == "average":
            import dataclasses

            ff = dataclasses.replace(ff, average=True)
        self.ff = ff

    def kw_velocity(self, args):
        self._require_state()
        t = float(args[0])
        seed = 12345
        if len(args) >= 3 and args[1] == "seed":
            seed = int(args[2])
        self.state = initialize_velocity(self.state, t, seed=seed)
        self.velocity_initialized = True
        # rpmd/trpmd read the physical temperature from the last velocity
        # keyword (ref: run.cu sets temperature from integrate parsing)
        self._last_velocity_t = t
        self.log(f"velocity: {t} K (seed {seed})")

    def kw_time_step(self, args):
        self.dt = float(args[0]) / TIME_UNIT_CONVERSION
        self.log(f"time_step: {args[0]} fs")

    def kw_ensemble(self, args):
        name = args[0]
        # MTTK/TI/MSST-style ensembles carry keyword tokens, not floats
        _kw_style = (
            name.endswith("_mttk") or name.startswith("ti")
            or name in ("msst", "nvt_qtb", "npt_qtb", "nphug",
                        "heat_hybrid", "ttm", "heat_ttm")
            or name.startswith("wall_")
        )
        p = [] if _kw_style else [float(x) for x in args[1:]]
        if name == "nve":
            self.ensemble = NVE()
        elif name in ("nvt_ber", "nvt_lan", "nvt_bdp", "nvt_nhc", "nvt_bao"):
            from gpumd_tpu.integrate.ensembles.nvt import NVTBAOAB

            t1, t2, tc = p[0], p[1], p[2]
            cls = {
                "nvt_ber": NVTBerendsen,
                "nvt_lan": NVTLangevin,
                "nvt_bdp": NVTBDP,
                "nvt_nhc": NVTNoseHooverChain,
                "nvt_bao": NVTBAOAB,
            }[name]
            self.ensemble = cls(t0=t1, t1=t2, coupling=tc)
        elif name == "nvt_qtb":
            # ensemble nvt_qtb T1 T2 Tc [f_max v] [N_f n]
            from gpumd_tpu.integrate.ensembles.qtb import NVTQTB

            t1, tc = float(args[1]), float(args[3])
            kwq = dict(temperature=t1, coupling=tc, dt=self.dt)
            i3 = 4
            while i3 < len(args):
                if args[i3] == "f_max":
                    kwq["f_max"] = float(args[i3 + 1])
                elif args[i3] == "N_f":
                    kwq["n_f"] = int(args[i3 + 1])
                else:
                    raise ValueError(f"unknown nvt_qtb keyword {args[i3]!r}")
                i3 += 2
            self.ensemble = NVTQTB(**kwq)
        elif name == "npt_qtb":
            # ensemble npt_qtb temp T1 T2 [tperiod x] [f_max v] [N_f n]
            # iso|aniso|tri ps pe | x|y|z ps pe [pperiod x]
            # (ref: ensemble_npt_qtb.cu:115-200)
            from gpumd_tpu.integrate.ensembles.mttk import MTTK
            from gpumd_tpu.integrate.ensembles.qtb import NPTQTB, NVTQTB

            toks = list(args[1:])
            kwq = dict(dt=self.dt)
            mode, uni = None, None
            ps = pe = 0.0
            p_period = 1000.0
            i3 = 0
            while i3 < len(toks):
                tkn = toks[i3]
                if tkn == "temp":
                    kwq["temperature"] = float(toks[i3 + 1]); i3 += 3
                elif tkn == "tperiod":
                    kwq["coupling"] = float(toks[i3 + 1]); i3 += 2
                elif tkn == "f_max":
                    kwq["f_max"] = float(toks[i3 + 1]); i3 += 2
                elif tkn == "N_f":
                    kwq["n_f"] = int(toks[i3 + 1]); i3 += 2
                elif tkn in ("iso", "aniso", "tri"):
                    mode = tkn
                    ps, pe = float(toks[i3 + 1]), float(toks[i3 + 2]); i3 += 3
                elif tkn in ("x", "y", "z"):
                    uni = tkn
                    ps, pe = float(toks[i3 + 1]), float(toks[i3 + 2]); i3 += 3
                elif tkn == "pperiod":
                    p_period = float(toks[i3 + 1]); i3 += 2
                else:
                    raise ValueError(f"unknown npt_qtb keyword {tkn!r}")
            if mode is None and uni is None:
                raise ValueError("npt_qtb requires pressure specification")
            if uni is not None:
                cfg2 = MTTK._baro_config({uni: (ps, pe)}, {uni: (ps, pe)}, None)
            else:
                cfg2 = MTTK._baro_config(ps, pe, mode)
            baro = MTTK(use_thermostat=False, use_barostat=True,
                        p_period=p_period, **cfg2)
            self.ensemble = NPTQTB(qtb=NVTQTB(**kwq), baro=baro)
        elif name in ("pimd", "rpmd", "trpmd"):
            # ensemble pimd <nbeads> T1 T2 Tc | rpmd/trpmd <nbeads>
            nbeads = int(p[0])
            if name == "pimd":
                # ensemble pimd <nbeads> T1 [T2] Tc — T1 -> T2 linear ramp
                # (ref: run.cu temperature interpolation)
                t1 = p[1]
                t2 = p[2] if len(p) > 3 else t1
                tc = p[3] if len(p) > 3 else (p[2] if len(p) > 2 else 100.0)
                self.ensemble = ("pimd", nbeads, t1, tc, t2)
            else:
                t = getattr(self, "_last_velocity_t", 300.0)
                self.ensemble = (name, nbeads, t, 100.0, t)
        elif name in ("heat_lan", "heat_nhc", "heat_bdp"):
            from gpumd_tpu.integrate.ensembles.heat import (
                HeatBDP,
                HeatLangevin,
                HeatNHC,
            )

            cls3 = {"heat_lan": HeatLangevin, "heat_nhc": HeatNHC,
                    "heat_bdp": HeatBDP}[name]
            t, tc, dt_, src, snk = p[0], p[1], p[2], int(p[3]), int(p[4])
            self.ensemble = cls3(
                temperature=t, coupling=tc, delta_t=dt_,
                source_mask=np.asarray(self.groups.mask(0, src)),
                sink_mask=np.asarray(self.groups.mask(0, snk)),
            )
        elif name == "heat_hybrid":
            # ensemble heat_hybrid <kind>... T <coupling>... dT <label>...
            # kind in {nhc, lan}; bath 0 = source (ref: heat_hybrid header)
            from gpumd_tpu.integrate.ensembles.heat import HeatHybrid

            toks = list(args[1:])
            kinds = []
            while toks and toks[0] in ("nhc", "lan"):
                kinds.append(toks.pop(0))
            nt = len(kinds)
            if nt < 2:
                raise ValueError("heat_hybrid needs >= 2 thermostats")
            t = float(toks.pop(0))
            coup = tuple(float(toks.pop(0)) for _ in range(nt))
            dt_ = float(toks.pop(0))
            labels = [int(toks.pop(0)) for _ in range(nt)]
            masks = tuple(
                np.asarray(self.groups.mask(0, lb)) for lb in labels
            )
            self.ensemble = HeatHybrid(
                kinds=tuple(kinds), temperature=t, couplings=coup,
                delta_t=dt_, masks=masks,
            )
        elif name in ("npt_ber", "npt_scr"):
            from gpumd_tpu.integrate.ensembles.npt import NPTSCR

            cls2 = NPTBerendsen if name == "npt_ber" else NPTSCR
            t1, t2, tc = p[0], p[1], p[2]
            rest = p[3:]
            if len(rest) == 3:  # isotropic: p C tau_p
                ens = cls2(
                    t0=t1, t1=t2, coupling=tc,
                    target_pressure=(rest[0],) * 3,
                    elastic_modulus=(rest[1],) * 3,
                    tau_p=rest[2], isotropic=True,
                )
            elif len(rest) == 7:  # px py pz Cx Cy Cz tau_p
                ens = cls2(
                    t0=t1, t1=t2, coupling=tc,
                    target_pressure=tuple(rest[0:3]),
                    elastic_modulus=tuple(rest[3:6]),
                    tau_p=rest[6],
                )
            else:
                raise ValueError(f"{name} needs 6 or 10 parameters")
            self.ensemble = ens
        elif name in ("nvt_mttk", "npt_mttk", "nph_mttk"):
            self.ensemble = self._parse_mttk(name, args[1:])
        elif name == "ti_spring":
            self.ensemble = self._parse_ti_spring(args[1:])
        elif name == "ti":
            self.ensemble = self._parse_ti(args[1:])
        elif name == "ti_liquid":
            self.ensemble = self._parse_ti_liquid(args[1:])
        elif name in ("ti_rs", "ti_as"):
            self.ensemble = self._parse_ti_npt(name, args[1:])
        elif name == "nphug":
            self.ensemble = self._parse_nphug(args[1:])
        elif name in ("ttm", "heat_ttm"):
            self.ensemble = self._parse_ttm(args[1:])
        elif name in ("wall_piston", "wall_mirror", "wall_harmonic"):
            self.ensemble = self._parse_wall(name, args[1:])
        elif name == "msst":
            from gpumd_tpu.integrate.ensembles.msst import MSST

            d = {"x": 0, "y": 1, "z": 2}[args[1]]
            kw2 = dict(shock_direction=d, vs=float(args[2]))
            i2 = 3
            while i2 < len(args):
                key = args[i2]
                if key not in ("qmass", "mu", "tscale", "p0", "v0", "e0"):
                    raise ValueError(f"unknown msst token {key!r}")
                kw2[key] = float(args[i2 + 1])
                i2 += 2
            self.ensemble = MSST(**kw2)
        else:
            raise ValueError(f"unsupported ensemble {name!r}")
        self.log(f"ensemble: {name} {args[1:]}")

    def _parse_wall(self, name, toks):
        """ensemble wall_piston vp v thickness d | wall_mirror vp v
        [thickness d] | wall_harmonic vp v k kk [thickness d]
        (ref: ensemble_wall_*.cu; vp input in km/s -> natural units via
        /100 * TIME_UNIT_CONVERSION, ensemble_wall_piston.cu:109)."""
        from gpumd_tpu.integrate.ensembles.walls import (
            WallHarmonic, WallMirror, WallPiston,
        )
        from gpumd_tpu.units import TIME_UNIT_CONVERSION

        kw = {}
        i = 0
        toks = list(toks)
        while i < len(toks):
            t = toks[i]
            if t == "vp":
                kw["vp"] = float(toks[i + 1]) / 100.0 * TIME_UNIT_CONVERSION
            elif t == "thickness":
                kw["thickness"] = float(toks[i + 1])
            elif t == "k" and name == "wall_harmonic":
                kw["k"] = float(toks[i + 1])
            else:
                raise ValueError(f"unknown {name} token {t!r}")
            i += 2
        cls = {"wall_piston": WallPiston, "wall_mirror": WallMirror,
               "wall_harmonic": WallHarmonic}[name]
        return cls(**kw)

    def _parse_ttm(self, toks):
        """ensemble ttm gm gid Ce rho_e kappa_e gamma_p gamma_s v_0
        nx ny nz T_e_init [ttm_out_interval n] [ttm_source s]
        (ref: ensemble_ttm.cu:84-300, unit conversions 742-790)."""
        from gpumd_tpu.integrate.ensembles.ttm import TTM
        from gpumd_tpu.units import TIME_UNIT_CONVERSION

        gm, gid = int(toks[0]), int(toks[1])
        ce, rho_e, kappa_e = (float(toks[i]) for i in (2, 3, 4))
        gamma_p, gamma_s, v0 = (float(toks[i]) for i in (5, 6, 7))
        nx, ny, nz = (int(toks[i]) for i in (8, 9, 10))
        t_e = float(toks[11])
        kw = {}
        i = 12
        while i < len(toks):
            if toks[i] == "ttm_out_interval":
                kw["out_interval"] = int(toks[i + 1])
            elif toks[i] == "ttm_source":
                kw["source"] = float(toks[i + 1]) / 1000.0
            else:
                raise ValueError(f"unknown ttm keyword {toks[i]!r}")
            i += 2
        h = np.asarray(self.box.h)
        dcell = (h[0, 0] / nx, h[1, 1] / ny, h[2, 2] / nz)
        v0_nat = v0 * TIME_UNIT_CONVERSION / 1000.0
        return TTM(
            gmask=np.asarray(self.groups.mask(gm, gid)),
            c_vol=ce * rho_e,
            kappa_e=kappa_e / 1000.0,
            gamma_p=gamma_p * TIME_UNIT_CONVERSION / 1000.0,
            gamma_s=gamma_s * TIME_UNIT_CONVERSION / 1000.0,
            v0_sq=v0_nat * v0_nat,
            grid=(nx, ny, nz),
            t_e_init=t_e,
            dcell_static=dcell,
            **kw,
        )

    def _parse_nphug(self, toks):
        """ensemble nphug [tperiod x] [pperiod x]
        iso|aniso|tri ps pe | x|y|z ps pe [p0 v] [v0 v] [e0 v]
        (ref: ensemble_nphug.cu:27-160)."""
        from gpumd_tpu.integrate.ensembles.mttk import NPHug
        from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

        toks = list(toks)
        kw = {}
        mode = None
        uni = -1
        ps = pe = 0.0
        i = 0
        while i < len(toks):
            t = toks[i]
            if t == "tperiod":
                kw["t_period"] = float(toks[i + 1]); i += 2
            elif t == "pperiod":
                kw["p_period"] = float(toks[i + 1]); i += 2
            elif t in ("iso", "aniso", "tri"):
                mode = t
                ps, pe = float(toks[i + 1]), float(toks[i + 2]); i += 3
            elif t in ("x", "y", "z"):
                uni = "xyz".index(t)
                ps, pe = float(toks[i + 1]), float(toks[i + 2]); i += 3
            elif t == "p0":
                kw["p0"] = float(toks[i + 1]) / PRESSURE_UNIT_CONVERSION
                i += 2
            elif t == "v0":
                kw["v0"] = float(toks[i + 1]); i += 2
            elif t == "e0":
                kw["e0"] = float(toks[i + 1]); i += 2
            else:
                raise ValueError(f"unknown nphug token {t!r}")
        if mode is None and uni < 0:
            raise ValueError("nphug: must specify barostat parameters")
        if uni >= 0:
            comp = "xyz"[uni]
            cfg = NPHug._baro_config({comp: (ps, pe)}, {comp: (ps, pe)}, None)
        else:
            cfg = NPHug._baro_config(ps, pe, mode)
        return NPHug(use_thermostat=True, use_barostat=True, uniaxial=uni,
                     **cfg, **kw)

    def _parse_ti(self, toks):
        """ensemble ti lambda x temp T [tperiod tau] spring El k ...
        (ref: ensemble_ti.cu:77-113)."""
        from gpumd_tpu.integrate.ensembles.ti import TI

        kw = dict(num_types=max(1, len(self.type_names)))
        toks = list(toks)
        i = 0
        spring = {}
        while i < len(toks):
            t = toks[i]
            if t == "lambda":
                kw["lam"] = float(toks[i + 1]); i += 2
            elif t == "temp":
                kw["temperature"] = float(toks[i + 1]); i += 2
            elif t == "tperiod":
                kw["coupling"] = float(toks[i + 1]); i += 2
            elif t == "spring":
                i += 1
                while i + 1 < len(toks):
                    spring[toks[i]] = float(toks[i + 1])
                    i += 2
            else:
                raise ValueError(f"unknown ti token {t!r}")
        missing = [s for s in self.type_names if s not in spring]
        if missing:
            raise ValueError(f"ti: spring constants missing for {missing}")
        kw["spring_k"] = tuple(spring[s] for s in self.type_names)
        return TI(**kw)

    def _parse_ti_liquid(self, toks):
        """ensemble ti_liquid temp T [press P] [tperiod tau] [tswitch n]
        [tequil n] [sigmasqrd s2] [p P_UF]
        (ref: ensemble_ti_liquid.cu:151-203)."""
        from gpumd_tpu.integrate.ensembles.ti import TILiquid
        from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

        kw = dict(num_types=max(1, len(self.type_names)))
        toks = list(toks)
        i = 0
        while i < len(toks):
            t = toks[i]
            if t == "temp":
                kw["temperature"] = float(toks[i + 1]); i += 2
            elif t == "press":
                kw["target_pressure"] = (
                    float(toks[i + 1]) / PRESSURE_UNIT_CONVERSION
                ); i += 2
            elif t == "tperiod":
                kw["coupling"] = float(toks[i + 1]); i += 2
            elif t == "tswitch":
                kw["t_switch"] = int(toks[i + 1]); i += 2
            elif t == "tequil":
                kw["t_equil"] = int(toks[i + 1]); i += 2
            elif t == "sigmasqrd":
                kw["sigma_sqrd"] = float(toks[i + 1]); i += 2
            elif t == "p":
                p_uf = float(toks[i + 1])
                if int(round(p_uf)) not in (1, 25, 50, 75, 100):
                    raise ValueError(
                        "ti_liquid: p must be 1, 25, 50, 75 or 100"
                    )
                kw["p_uf"] = p_uf; i += 2
            else:
                raise ValueError(f"unknown ti_liquid token {t!r}")
        return TILiquid(**kw)

    def _parse_ti_npt(self, name, toks):
        """ensemble ti_rs temp T Tmax iso|aniso|tri P [tperiod x]
        [pperiod x] [tswitch n] [tequil n]   (ref: ensemble_ti_rs.cu:52-105)
        ensemble ti_as temp T press pmin pmax iso P ...
        (ref: ensemble_ti_as.cu:24-135)."""
        from gpumd_tpu.integrate.ensembles.ti import TIAS, TIRS

        toks = list(toks)
        kw = {}
        mode = "iso"
        press = 0.0
        i = 0
        while i < len(toks):
            t = toks[i]
            if t == "temp":
                if name == "ti_rs":
                    kw["t_start"] = kw["t_stop"] = float(toks[i + 1])
                    kw["t_max"] = float(toks[i + 2]); i += 3
                else:
                    kw["t_start"] = kw["t_stop"] = float(toks[i + 1]); i += 2
            elif t == "press":
                kw["p_min"] = float(toks[i + 1])
                kw["p_max"] = float(toks[i + 2]); i += 3
            elif t in ("iso", "aniso", "tri"):
                mode = t
                press = float(toks[i + 1]); i += 2
            elif t == "tperiod":
                kw["t_period"] = float(toks[i + 1]); i += 2
            elif t == "pperiod":
                kw["p_period"] = float(toks[i + 1]); i += 2
            elif t == "tswitch":
                kw["t_switch"] = int(toks[i + 1]); i += 2
            elif t == "tequil":
                kw["t_equil"] = int(toks[i + 1]); i += 2
            else:
                raise ValueError(f"unknown {name} token {t!r}")
        cls = TIRS if name == "ti_rs" else TIAS
        if name == "ti_as" and "p_min" not in kw:
            kw["p_min"] = kw["p_max"] = press
        cfg = cls._baro_config(press, press, mode)
        return cls(use_thermostat=True, use_barostat=True, **cfg, **kw)

    def _parse_ti_spring(self, toks):
        """ensemble ti_spring temp T [tperiod tau] [tswitch n tequil n]
        [press P] [spring El k ...] (ref: ensemble_ti_spring.cu:100-150)."""
        from gpumd_tpu.integrate.ensembles.ti import TISpring
        from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION

        kw = dict(num_types=max(1, len(self.type_names)))
        toks = list(toks)
        i = 0
        spring = {}
        while i < len(toks):
            t = toks[i]
            if t == "temp":
                kw["temperature"] = float(toks[i + 1]); i += 2
            elif t == "tperiod":
                kw["coupling"] = float(toks[i + 1]); i += 2
            elif t == "tswitch":
                kw["t_switch"] = int(toks[i + 1]); i += 2
            elif t == "tequil":
                kw["t_equil"] = int(toks[i + 1]); i += 2
            elif t == "press":
                kw["target_pressure"] = (
                    float(toks[i + 1]) / PRESSURE_UNIT_CONVERSION
                ); i += 2
            elif t == "spring":
                i += 1
                while i + 1 < len(toks):
                    spring[toks[i]] = float(toks[i + 1])
                    i += 2
            else:
                raise ValueError(f"unknown ti_spring token {t!r}")
        if spring:
            missing = [s for s in self.type_names if s not in spring]
            if missing:
                raise ValueError(
                    f"ti_spring: spring constants missing for {missing}"
                )
            kw["spring_k"] = tuple(spring[s] for s in self.type_names)
        return TISpring(**kw)

    def _parse_mttk(self, name, toks):
        """MTTK keyword stream (ref: ensemble_mttk.cu:81-238):
        temp T1 T2 | tperiod t | pperiod p | iso/aniso/tri P1 P2 |
        x/y/z/xy/xz/yz P1 P2 | couple xyz/xy/yz/xz."""
        from gpumd_tpu.integrate.ensembles.mttk import MTTK

        t1 = t2 = None
        tper, pper = 100.0, 1000.0
        mode = None
        p1 = p2 = 0.0
        comps = {}
        i = 0
        toks = list(toks)
        while i < len(toks):
            t = toks[i]
            if t == "temp":
                t1, t2 = float(toks[i + 1]), float(toks[i + 2])
                i += 3
            elif t == "tperiod":
                tper = float(toks[i + 1])
                i += 2
            elif t == "pperiod":
                pper = float(toks[i + 1])
                i += 2
            elif t in ("iso", "aniso", "tri"):
                mode = t
                p1, p2 = float(toks[i + 1]), float(toks[i + 2])
                i += 3
            elif t in ("x", "y", "z", "xy", "xz", "yz"):
                comps[t] = (float(toks[i + 1]), float(toks[i + 2]))
                i += 3
            else:
                raise ValueError(f"unknown {name} token {t!r}")
        if comps:
            baro = (comps, comps)
        elif mode is not None:
            baro = (p1, p2)
        else:
            baro = None
        if name == "nvt_mttk":
            if t1 is None:
                raise ValueError("nvt_mttk needs temp T1 T2")
            return MTTK.nvt(t1, t2, t_period=tper)
        if name == "nph_mttk":
            if baro is None:
                raise ValueError("nph_mttk needs a barostat spec")
            return MTTK.nph(baro[0], baro[1], mode=mode or "aniso",
                            p_period=pper)
        if t1 is None or baro is None:
            raise ValueError("npt_mttk needs temp and a barostat spec")
        return MTTK.npt(t1, t2, baro[0], baro[1], mode=mode or "aniso",
                        t_period=tper, p_period=pper)

    def kw_dump_thermo(self, args):
        interval = int(args[0])
        f = self._file(
            "thermo.out",
            f"# dump_thermo {interval}\n# format_version 1\n"
            f"# num_atoms {self._n}\n"
            f"# dt_output {self.dt * interval * TIME_UNIT_CONVERSION:.10e} fs\n"
            "# columns T KE PE sxx syy szz syz sxz sxy "
            "ax ay az bx by bz cx cy cz\n",
        )

        def process(session, state, step):
            th = compute_thermo(state)
            p = np.asarray(th.pressure) * PRESSURE_UNIT_CONVERSION
            h = np.asarray(state.box.h)
            row = [
                float(th.temperature), float(th.kinetic_energy),
                float(th.potential_energy),
                p[0, 0], p[1, 1], p[2, 2], p[1, 2], p[0, 2], p[0, 1],
                # lattice vectors a, b, c (columns of h)
                h[0, 0], h[1, 0], h[2, 0],
                h[0, 1], h[1, 1], h[2, 1],
                h[0, 2], h[1, 2], h[2, 2],
            ]
            f.write("".join(f"{x:20.10e}" for x in row) + "\n")
            f.flush()

        self.properties.append(PropertyRequest(interval, process))
        self.log(f"dump_thermo every {interval}")

    def _dump_frame(self, state: MDState, filename, with_vel, with_forces):
        n = self._n
        pos = np.asarray(state.box.wrap(state.position))[:n]
        frame = XYZFrame(
            symbols=self.symbols,
            positions=pos,
            lattice=np.asarray(state.box.h).T,
            pbc=self.frame.pbc,
            velocities=np.asarray(state.velocity)[:n] / TIME_UNIT_CONVERSION
            if with_vel
            else None,
            forces=np.asarray(state.force)[:n] if with_forces else None,
            masses=np.asarray(state.mass)[:n],
        )
        write_xyz(
            os.path.join(self.workdir, filename),
            frame,
            append=True,
            with_velocities=with_vel,
            with_forces=with_forces,
        )

    def kw_dump_exyz(self, args):
        interval = int(args[0])
        with_vel = len(args) > 1 and args[1] == "1"
        with_f = len(args) > 2 and args[2] == "1"

        def process(session, state, step):
            self._dump_frame(state, "dump.xyz", with_vel, with_f)

        self.properties.append(PropertyRequest(interval, process))
        self.log(f"dump_exyz every {interval}")

    def kw_dump_xyz(self, args):
        """dump_xyz grouping_method group_id interval filename [quantities…]

        Group-selective extended-XYZ dump (ref: dump_xyz.cu:73-160).
        grouping_method < 0 dumps the whole system; a trailing '*' on the
        filename writes one file per frame.  Quantities: velocity, force,
        mass, potential, unwrapped_position.
        """
        if len(args) < 4:
            raise ValueError("dump_xyz needs at least 4 parameters")
        gm, gid, interval = int(args[0]), int(args[1]), int(args[2])
        filename = args[3]
        if interval <= 0:
            raise ValueError("dump interval should be > 0")
        if gm >= 0:
            if gm >= self.groups.n_methods:
                raise ValueError("grouping method exceeds the bound")
            if not 0 <= gid < self.groups.num_groups(gm):
                raise ValueError("group id exceeds the bound")
        quantities = set(args[4:])
        known = {
            "velocity", "force", "mass", "potential", "unwrapped_position",
            "charge", "bec", "group", "virial",
        }
        unknown = quantities - known
        if unknown:
            raise ValueError(f"unknown dump_xyz quantities {sorted(unknown)}")
        separated = filename.endswith("*")
        base = filename[:-1] if separated else filename
        first = [True]

        def process(session, state, step):
            n = session._n
            if gm >= 0:
                sel = np.where(session.groups.labels[:n, gm] == gid)[0]
            else:
                sel = np.arange(n)
            pos = np.asarray(state.box.wrap(state.position))[:n][sel]
            prop = "species:S:1:pos:R:3"
            cols = [pos]
            if "mass" in quantities:
                prop += ":mass:R:1"
                cols.append(np.asarray(state.mass)[:n][sel, None])
            if "velocity" in quantities:
                prop += ":vel:R:3"
                cols.append(
                    np.asarray(state.velocity)[:n][sel] / TIME_UNIT_CONVERSION
                )
            if "force" in quantities:
                prop += ":forces:R:3"
                cols.append(np.asarray(state.force)[:n][sel])
            if "potential" in quantities:
                prop += ":energy_atom:R:1"
                cols.append(np.asarray(state.potential_energy)[:n][sel, None])
            if "unwrapped_position" in quantities:
                prop += ":unwrapped_position:R:3"
                up = (
                    state.unwrapped_position
                    if state.unwrapped_position is not None
                    else state.position
                )
                cols.append(np.asarray(up)[:n][sel])
            h = np.asarray(state.box.h)
            lat = " ".join(f"{x:.15g}" for x in h.T.ravel())
            pb = " ".join("T" if p else "F" for p in session.frame.pbc)
            path = os.path.join(
                session.workdir, f"{base}{step}" if separated else base
            )
            mode = "w" if separated or first[0] else "a"
            first[0] = False
            with open(path, mode) as f:
                f.write(f"{len(sel)}\n")
                f.write(f'Lattice="{lat}" Properties={prop} pbc="{pb}"\n')
                data = np.concatenate(cols, axis=1)
                for k, i in enumerate(sel):
                    f.write(
                        f"{session.symbols[i]:<2s} "
                        + " ".join(f"{x:.15g}" for x in data[k])
                        + "\n"
                    )

        self.properties.append(PropertyRequest(interval, process))
        self.log(
            f"dump_xyz group {gm}/{gid} every {interval} into {filename}"
        )

    def kw_dump_position(self, args):
        interval = int(args[0])

        def process(session, state, step):
            self._dump_frame(state, "movie.xyz", False, False)

        self.properties.append(PropertyRequest(interval, process))

    def kw_plumed(self, args):
        """plumed <dat_file> <interval> <restart>: enhanced-sampling bias
        via libplumed (loaded at runtime; ref: plumed.cu:108-131).  The
        bias force is merged into state.force and per-atom virials are
        rescaled each invocation like the reference."""
        from gpumd_tpu.measure.plumed_bridge import PlumedBridge

        self._require_state()
        dat, interval, restart = args[0], int(args[1]), int(args[2]) == 1
        n = self._n
        bridge = PlumedBridge(
            os.path.join(self.workdir, dat), interval, restart, n,
            np.asarray(self.state.mass)[:n], self.dt,
            getattr(self.ensemble, "temperature", 300.0),
        )

        def process(session, state, step):
            pos = np.asarray(state.position)[:n]
            frc = np.array(np.asarray(state.force)[:n])
            vir = np.array(np.asarray(state.virial)[:n])
            f_new, v_new, bias = bridge.compute(
                pos, frc, np.asarray(state.box.h), vir
            )
            force = np.asarray(state.force).copy()
            force[:n] = f_new
            virial = np.asarray(state.virial).copy()
            virial[:n] = v_new
            session.state = state._replace(
                force=jnp.asarray(force), virial=jnp.asarray(virial)
            )

        def finalize(session):
            bridge.finalize()

        self.properties.append(PropertyRequest(
            interval, process, finalize,
            needs_atom_virial=True, mutates_state=True,
        ))

    def kw_dump_netcdf(self, args):
        """dump_netcdf grouping_method group_id interval has_velocity file
        [precision single|double] [compression N] -> AMBER NetCDF trajectory
        (ref: dump_netcdf.cu:86-200; written with scipy's NetCDF-3 backend,
        compression is NetCDF-4-only and ignored)."""
        from gpumd_tpu.measure.netcdf_dump import DumpNetCDF

        method, gid = int(args[0]), int(args[1])
        interval = int(args[2])
        has_vel = int(args[3]) == 1
        filename = args[4]
        precision = "double"
        k = 5
        while k < len(args):
            if args[k] == "precision":
                precision = args[k + 1]; k += 2
            elif args[k] == "compression":
                self.log("dump_netcdf: compression ignored (NetCDF-3)")
                k += 2
            else:
                raise ValueError(f"unknown dump_netcdf token {args[k]!r}")
        if method >= 0:
            sel = np.asarray(self.groups.mask(method, gid)) > 0
        else:
            sel = None
        dumper = DumpNetCDF(
            os.path.join(self.workdir, filename), has_vel, precision,
            grouping_method=method, group_id=gid,
        )

        def process(session, state, step):
            n = session._n
            pos = np.asarray(state.position)[:n]
            types = np.asarray(state.type)[:n]
            vel = np.asarray(state.velocity)[:n] if has_vel else None
            if sel is not None:
                pick = sel[:n]
                pos, types = pos[pick], types[pick]
                vel = vel[pick] if vel is not None else None
            t_ps = step * self.dt / 1000.0 * TIME_UNIT_CONVERSION
            dumper.add_frame(
                t_ps, pos, types, np.asarray(state.box.h), vel
            )

        def finalize(session):
            dumper.write()
            self.log(f"dump_netcdf: {len(dumper.frames)} frames -> "
                     f"{dumper.path}")

        self.properties.append(PropertyRequest(interval, process, finalize))

    def kw_dump_velocity(self, args):
        """velocity.out: one row per atom per frame, A/fs."""
        interval = int(args[0])
        f = self._file("velocity.out")

        def process(session, state, step):
            v = np.asarray(state.velocity)[: session._n] / TIME_UNIT_CONVERSION
            for row in v:
                f.write(" ".join(f"{x:g}" for x in row) + "\n")
            f.flush()

        self.properties.append(PropertyRequest(interval, process))

    def kw_dump_force(self, args):
        interval = int(args[0])
        f = self._file("force.out")

        def process(session, state, step):
            fc = np.asarray(state.force)[: session._n]
            for row in fc:
                f.write(" ".join(f"{x:g}" for x in row) + "\n")
            f.flush()

        self.properties.append(PropertyRequest(interval, process))

    def kw_compute_cohesive(self, args):
        """compute_cohesive start end d: energy vs isotropic/uniaxial scale
        factor -> cohesive.out (ref: cohesive.cu:110-240). 1000 points per
        unit factor."""
        self._require_state()
        start, end, d = float(args[0]), float(args[1]), int(args[2])
        num_points = round((end - start) * 1000) + 1
        factors = np.linspace(start, end, num_points)
        base_h = np.asarray(self.state.box.h)
        base_pos = np.asarray(self.state.position)
        # one neighbor plan sized for the most-compressed geometry
        smallest = self.state.box.with_h(jnp.asarray(base_h * start))
        ff = ForceField.create(
            self.potentials, smallest, self._n,
            mn=_auto_mn(self.potentials, self._n, smallest)
        )
        state0 = self.state

        def energy_of(fac):
            scale = (
                jnp.full((3,), fac)
                if d == 0
                else jnp.ones(3).at[(d - 1) % 3].set(fac)
            )
            box = state0.box.with_h(jnp.asarray(base_h) * scale[None, :])
            pos = jnp.asarray(base_pos) * scale[None, :]
            out = ff.compute(state0._replace(position=pos, box=box))
            return jnp.sum(out.potential_energy * out.mask)

        energies = jax.jit(lambda fs: jax.lax.map(energy_of, fs))(
            jnp.asarray(factors, base_pos.dtype)
        )
        f = self._file("cohesive.out")
        for fac, e in zip(factors, np.asarray(energies)):
            f.write(f"{fac:15.7e}{e:15.7e}\n")
        f.flush()
        self.log(f"compute_cohesive: {num_points} points written")

    def kw_compute_elastic(self, args):
        """compute_elastic strain cubic: C11/C12/C44 from energy-strain
        curvature (ref: cohesive.cu:151-340) -> elastic.out."""
        self._require_state()
        strain = float(args[0])
        base_h = np.asarray(self.state.box.h)
        base_pos = np.asarray(self.state.position)
        v0 = float(self.state.box.volume)

        def energy(defm):
            h = jnp.asarray(defm @ base_h)
            box = self.state.box.with_h(h)
            pos = jnp.asarray(base_pos @ defm.T)
            ff = ForceField.create(
                self.potentials, box, self._n,
                mn=_auto_mn(self.potentials, self._n, box)
            )
            out = jax.jit(ff.compute)(
                self.state._replace(position=pos, box=box)
            )
            return float(jnp.sum(out.potential_energy * out.mask))

        from gpumd_tpu.units import PRESSURE_UNIT_CONVERSION as P_GPA

        e0 = energy(np.eye(3))

        def curvature(d_plus, d_minus):
            return (energy(d_plus) + energy(d_minus) - 2 * e0) / strain**2

        # uniaxial: d2E/de_xx^2 = C11 V
        dp = np.eye(3); dp[0, 0] += strain
        dm = np.eye(3); dm[0, 0] -= strain
        c11 = curvature(dp, dm) / v0 * P_GPA
        # biaxial xx+yy: V (2 C11 + 2 C12)
        dp = np.eye(3); dp[0, 0] += strain; dp[1, 1] += strain
        dm = np.eye(3); dm[0, 0] -= strain; dm[1, 1] -= strain
        c12 = (curvature(dp, dm) / v0 * P_GPA - 2 * c11) / 2.0
        # shear xy: V (4 C44) for engineering strain gamma = 2 e_xy
        dp = np.eye(3); dp[0, 1] += strain; dp[1, 0] += strain
        dm = np.eye(3); dm[0, 1] -= strain; dm[1, 0] -= strain
        c44 = curvature(dp, dm) / v0 * P_GPA / 4.0
        f = self._file("elastic.out")
        f.write("# Elastic Constants (GPa): C11 C12 C44\n")
        f.write(f"{c11:10.3f} {c12:10.3f} {c44:10.3f}\n")
        f.flush()
        self.log(f"compute_elastic: C11={c11:.1f} C12={c12:.1f} C44={c44:.1f} GPa")

    def kw_dump_restart(self, args):
        interval = int(args[0])

        def process(session, state, step):
            n = self._n
            frame = XYZFrame(
                symbols=self.symbols,
                positions=np.asarray(state.box.wrap(state.position))[:n],
                lattice=np.asarray(state.box.h).T,
                pbc=self.frame.pbc,
                velocities=np.asarray(state.velocity)[:n] / TIME_UNIT_CONVERSION,
                masses=np.asarray(state.mass)[:n],
            )
            write_xyz(
                os.path.join(self.workdir, "restart.xyz"),
                frame, append=False, with_velocities=True, with_masses=True,
            )

        self.properties.append(PropertyRequest(interval, process))

    def kw_correct_velocity(self, args):
        interval = int(args[0])

        def process(session, state, step):
            session.state = correct_velocity(state)

        self.properties.append(PropertyRequest(interval, process))

    def kw_engine(self, args):
        """engine dense|list [n_devices] [axis]: route `run` through the
        fused dense cell-grid NEP engine (engine/dense_md.py; bench hot
        path) or the slab-sharded variant when n_devices > 1
        (engine/sharded.py; `axis` in x|y|z picks the partition direction,
        like the reference's user-selectable partition,
        nep_multigpu.cu:1429-1455).  Extension keyword — the reference
        selects its multi-GPU path by device count (force.cu NEP_MULTIGPU
        dispatch); here it is explicit.
        """
        self.engine_mode = args[0]
        self.engine_devices = int(args[1]) if len(args) > 1 else 1
        self.engine_axis = args[2] if len(args) > 2 else "z"
        if self.engine_mode not in ("dense", "list", "auto"):
            raise ValueError("engine must be 'dense', 'list' or 'auto'")
        if self.engine_axis not in ("x", "y", "z"):
            raise ValueError("engine partition axis must be x, y or z")
        self.log(f"engine: {self.engine_mode}")

    # ensembles the dense fast path integrates correctly today: constant-box
    # state-protocol thermostats + the Berendsen/SCR barostats (box-rescale
    # handled by the fractional-displacement Verlet criterion + in-scan cell
    # thickness guard).  Everything else falls back to the list path.
    _DENSE_ENSEMBLES = (
        "NVE", "NVTBerendsen", "NVTLangevin", "NVTBDP", "NVTBAOAB",
        "NVTNoseHooverChain", "NPTBerendsen", "NPTSCR",
    )

    def _dense_route_reason(self, ens):
        """None when this run qualifies for the compact fast path, else a
        human-readable reason for falling back to the list path.

        The reference has ONE hot path — every run.in deck hits the
        production kernels (ref: src/force/force.cu:514-565 dispatches by
        potential, not by a user keyword).  `engine auto` (the default)
        mirrors that on TPU; on CPU the Pallas kernels only run in
        interpret mode, which is slower than the XLA list path, so auto
        prefers list there (`engine dense` still forces the fast path)."""
        from gpumd_tpu.potentials.nep.model import NEP as _NEP
        from gpumd_tpu.potentials.tersoff import Tersoff1989 as _T89

        if jax.default_backend() != "tpu":
            return "non-TPU backend (interpret-mode kernels are slower)"
        if len(self.potentials) != 1 and getattr(
                self, "observer_mode", None) != "observe":
            # observe mode: potential 0 drives the MD; the other models
            # evaluate at dump intervals only (chunk boundaries), so the
            # hot loop still qualifies (ref: dump_observer.cu:29-80 — the
            # reference likewise integrates with potential 0)
            return "multiple potentials"
        pot = self.potentials[0]
        if isinstance(pot, _NEP):
            from gpumd_tpu.engine.nep_compact import CompactSpec

            try:
                CompactSpec.from_model(pot.model, pot.params)
            except NotImplementedError as e:
                return f"model not compact-eligible ({e})"
        elif not isinstance(pot, _T89):
            return f"potential {type(pot).__name__} has no compact engine"
        if type(ens).__name__ not in self._DENSE_ENSEMBLES:
            return f"ensemble {type(ens).__name__} runs on the list path"
        if getattr(self, "mc", None) is not None:
            return "MCMD run"
        if getattr(self, "_deposit", None) is not None:
            return "deposition source"
        if getattr(self, "deform", None) is not None:
            return "deform run"
        if getattr(self, "move_pin", None) is not None:
            return "move groups"
        if getattr(self, "drivers", None):
            return "add_force/add_efield/electron_stop drivers"
        if self.ff.hnemdec_mode is not None:
            return "compute_hnemdec"
        if any(getattr(m, "needs_stress", False) for m in self.measure_props):
            return "per-step stress observer"
        if any(
            getattr(m, "needs_onsager", False) for m in self.measure_props
        ):
            return "onsager flux observer"
        if any(p.mutates_state for p in self.properties):
            return "state-mutating property (plumed)"
        from gpumd_tpu.engine.nep_compact import plan_grid_compact

        rc = (
            pot.model.rc_radial_max if isinstance(pot, _NEP) else pot.rc
        )
        n = self._n
        plan = plan_grid_compact(
            self.state.box, rc, 1.0, n,
            position=np.asarray(self.state.position)[:n],
        )
        if plan is None:
            return "box too thin for the cell grid (< 3 cells per axis)"
        return None

    def _run_dense(self, n_steps, ens):
        """MD block on the dense engine: supports a single NEP potential
        and state-protocol ensembles; properties observe input-order
        snapshots at chunk boundaries."""
        from gpumd_tpu.engine.dense_md import DenseNEPMD
        from gpumd_tpu.potentials.nep.model import NEP as _NEP
        from gpumd_tpu.potentials.tersoff import Tersoff1989 as _T89

        driving = self.potentials[:1] if getattr(
            self, "observer_mode", None) == "observe" else self.potentials
        neps = [p for p in driving if isinstance(p, _NEP)]
        tersoffs = [p for p in driving if isinstance(p, _T89)]
        if len(driving) != 1 or not (neps or tersoffs):
            raise ValueError(
                "engine dense: exactly one driving NEP or Tersoff1989 "
                "potential")
        needs_heat = any(
            getattr(m, "needs_heat", False) for m in self.measure_props
        )
        needs_av = any(
            getattr(m, "needs_atom_virial", False) for m in self.measure_props
        ) or any(p.needs_atom_virial for p in self.properties)
        nep = neps[0] if neps else None
        n = self._n
        state = self.state
        ndev = getattr(self, "engine_devices", 1)
        # properties with a device_init accumulate inside the scan (no host
        # sync, no chunk collapse); everything else samples at chunk
        # boundaries (ref analog: measure.process every step, run.cu:299)
        # on-device accumulators consume slot state only (per-atom virial /
        # heat current), so they ride the compact Tersoff engine too
        dev_props = [
            m for m in self.measure_props
            if hasattr(m, "device_init") and ndev == 1
        ]
        host_props = [m for m in self.measure_props if m not in dev_props]
        intervals = [p.interval for p in self.properties] + [
            m.interval for m in host_props
        ]
        chunk = _bounded_chunk(
            math.gcd(*intervals) if intervals else n_steps, n_steps)
        if ndev > 1:
            if nep is None:
                raise ValueError("engine dense multi-device: NEP only")
            return self._run_dense_sharded(n_steps, ens, nep, chunk)
        hnemd_fe = self.ff.hnemd_fe
        if self.ff.hnemdec_mode is not None:
            raise ValueError(
                "engine dense: compute_hnemdec needs `engine list`"
            )
        if nep is None:
            from gpumd_tpu.engine.tersoff_compact import CompactTersoffMD

            # round 5: Tersoff heat observables (HNEMD/SHC, BASELINE
            # config 4) run on the compact fast path — the kernel's pair
            # cotangents already carry the Fan2015 per-atom virial
            md = CompactTersoffMD(
                tersoffs[0], state.box, n,
                position=np.asarray(state.position)[:n],
                per_atom_virial=needs_heat or needs_av
                or hnemd_fe is not None,
            )
            md.hnemd_fe = hnemd_fe
        else:
            md = DenseNEPMD(
                nep, state.box, n, position=np.asarray(state.position)[:n],
                per_atom_virial=needs_heat or needs_av
                or hnemd_fe is not None,
            )
            if (
                needs_heat or needs_av or hnemd_fe is not None
            ) and md.engine != "compact":
                raise ValueError(
                    "engine dense: per-atom heat-current observables need "
                    "the compact engine (this model fell back to the window "
                    "engine); use `engine list`"
                )
            md.hnemd_fe = hnemd_fe
        carry = md.init_carry(state)
        carry = carry._replace(
            state=jax.jit(md.compute)(carry.state, carry.idx)
        )
        aux = ens.init(carry.state)
        from gpumd_tpu.measure.properties import heat_current_5

        heat_props = [
            m for m in self.measure_props if hasattr(m, "consume_heat")
        ]
        observer = (
            (lambda st: heat_current_5(st)) if heat_props else None
        )
        if dev_props:
            def measure(maccs, st, orig_id):
                return tuple(
                    m.device_update(a, st, orig_id)
                    for m, a in zip(dev_props, maccs)
                )
            maccs = tuple(m.device_init(self, n) for m in dev_props)
        else:
            measure, maccs = None, ()
        step = md.make_step(ens, self.dt, observer=observer,
                            measure=measure)

        @jax.jit
        def block(carry, aux, maccs):
            if dev_props:
                (carry, aux, maccs), ys = jax.lax.scan(
                    step, (carry, aux, maccs), length=chunk
                )
            else:
                (carry, aux), ys = jax.lax.scan(
                    step, (carry, aux), length=chunk
                )
            return carry, aux, maccs, ys

        t0 = time.time()
        done = 0
        while done < n_steps:
            carry, aux, maccs, ys = block(carry, aux, maccs)
            if heat_props:
                rows = np.asarray(ys)  # (chunk, 5)
                for m in heat_props:
                    m.consume_heat(rows, self.global_step)
                    m.maybe_output(self)
            done += chunk
            self.global_step += chunk
            if bool(carry.overflow):
                raise RuntimeError(
                    "dense engine: cell capacity overflow — rerun with "
                    "engine list or a larger skin"
                )
            snap = md.to_input_order(carry, n)
            pe = float(jnp.sum(snap.potential_energy * snap.mask))
            if not np.isfinite(pe):
                raise RuntimeError(
                    f"non-finite potential energy at step {self.global_step}"
                )
            self.state = snap
            # live engine context: dump_observer ensemble members evaluate
            # on the compact pipeline with the driver's plan + neighbor
            # build (one hot path, ref: dump_observer.cu:29-80)
            self._dense_eval_ctx = (md, carry)
            for prop in self.properties:
                if done % prop.interval == 0:
                    prop.process(self, snap, self.global_step)
            for m in host_props:
                if done % m.interval == 0 and hasattr(m, "sample_state"):
                    m.sample_state(self, snap, self.global_step)
        wall = time.time() - t0
        rate = n * n_steps / max(wall, 1e-9)
        self.log(f"Speed of this run = {rate:.5g} atom*step/second (dense)")
        for m, a in zip(dev_props, maccs):
            m.device_postprocess(self, a)
        self._finish_dense_run()

    def _finish_dense_run(self):
        self._dense_eval_ctx = None
        for m in self.measure_props:
            m.postprocess(self)
        self.measure_props = []
        if (
            self.ff.hnemd_fe is not None or self.ff.hnemdec_mode is not None
        ):
            import dataclasses

            self.ff = dataclasses.replace(
                self.ff, hnemd_fe=None, hnemdec_mode=None,
                hnemdec_fe=None, hnemdec_coef=None,
            )
        for prop in self.properties:
            if prop.finalize:
                prop.finalize(self)
        self.properties = []
        self.drivers = []

    def _run_dense_sharded(self, n_steps, ens, nep, chunk):
        """Multi-chip dense run: z-slab ShardedDenseMD blocks with global
        rebins between chunks (ref semantics: nep_multigpu.cu slab
        partition + halo exchange, rebuilt TPU-style with shard_map +
        ppermute in engine/sharded.py)."""
        from jax.sharding import Mesh

        from gpumd_tpu.engine.sharded import ShardedDenseMD

        ndev = self.engine_devices
        if len(jax.devices()) < ndev:
            raise RuntimeError(
                f"engine dense {ndev}: only {len(jax.devices())} devices "
                "visible"
            )
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("slab",))
        n = self._n
        state = self.state
        needs_heat = any(
            getattr(m, "needs_heat", False) for m in self.measure_props
        )
        needs_heat = needs_heat or any(
            getattr(m, "needs_atom_virial", False) for m in self.measure_props
        ) or any(p.needs_atom_virial for p in self.properties)
        hnemd_fe = self.ff.hnemd_fe
        smd = ShardedDenseMD(
            nep, state.box, n, mesh,
            position=np.asarray(state.position)[:n],
            axis=getattr(self, "engine_axis", "z"),
            per_atom_virial=needs_heat or hnemd_fe is not None,
        )
        if (needs_heat or hnemd_fe is not None) and smd.engine != "compact":
            raise ValueError(
                "engine dense sharded: heat observables need the compact "
                "engine; use `engine list`")
        smd.hnemd_fe = hnemd_fe
        from gpumd_tpu.measure.properties import heat_current_5

        heat_props = [
            m for m in self.measure_props if hasattr(m, "consume_heat")
        ]
        observer = (
            (lambda st: heat_current_5(st)) if heat_props else None
        )
        block, _ = smd.make_block(ens, self.dt, steps=chunk,
                                  observer=observer)
        block = jax.jit(block)
        block1 = None  # steps=1 fallback when drift invalidates a block
        sstate, oid, overflow = smd.bin_state(state, with_id=True)
        if bool(overflow):
            raise RuntimeError("dense engine: cell capacity overflow")
        aux = None
        t0 = time.time()
        done = 0
        while done < n_steps:
            pre_state, pre_aux = sstate, aux
            sstate, aux, ok, ys = block(sstate, aux)
            if not bool(ok):
                # drift exceeded skin/2 (or a cap overflowed) inside the
                # block: the compact index tiles went stale mid-block.
                # Restore the pre-block snapshot and advance with per-step
                # blocks (index rebuild every step) for this chunk.
                self.log("sharded block invalidated by drift; retrying "
                         "with per-step index rebuilds")
                if block1 is None:
                    block1 = jax.jit(smd.make_block(
                        ens, self.dt, steps=1, observer=observer)[0])
                sstate, aux = pre_state, pre_aux
                ys_rows = []
                for _ in range(chunk):
                    sstate, aux, ok, y1 = block1(sstate, aux)
                    if not bool(ok):
                        raise RuntimeError(
                            "dense engine: neighbor cap overflow")
                    if observer is not None:
                        ys_rows.append(np.asarray(y1)[0])
                ys = np.asarray(ys_rows) if ys_rows else ys
            if heat_props:
                rows = np.asarray(ys)
                for m in heat_props:
                    m.consume_heat(rows, self.global_step)
                    m.maybe_output(self)
            done += chunk
            self.global_step += chunk
            # global rebin between blocks (amortized; atoms drift < skin/2
            # within a block for typical chunk sizes)
            snap = smd.gather_input_order(sstate, oid, n)
            pe = float(jnp.sum(snap.potential_energy * snap.mask))
            if not np.isfinite(pe):
                raise RuntimeError(
                    f"non-finite potential energy at step {self.global_step}"
                )
            self.state = snap
            for prop in self.properties:
                if done % prop.interval == 0:
                    prop.process(self, snap, self.global_step)
            for m in self.measure_props:
                if done % m.interval == 0 and hasattr(m, "sample_state"):
                    m.sample_state(self, snap, self.global_step)
            if done < n_steps:
                sstate, oid, overflow = smd.bin_state(snap, with_id=True)
                if bool(overflow):
                    raise RuntimeError("dense engine: cell overflow")
        wall = time.time() - t0
        rate = n * n_steps / max(wall, 1e-9)
        self.log(
            f"Speed of this run = {rate:.5g} atom*step/second "
            f"(dense, {ndev} devices)"
        )
        self._finish_dense_run()

    def _wire_nep_temperature(self, ens):
        """temperature-dependent NEP (model_type 3): feed the ensemble
        target temperature (ref: run.cu:679-681 sets force.temperature =
        temperature1).  Applies to the list AND dense engine paths."""
        import dataclasses

        from gpumd_tpu.potentials.nep.model import NEP as _NEP

        if not any(
            isinstance(p, _NEP) and p.model.model_type == 3
            for p in self.potentials
        ):
            return
        t_tgt = getattr(ens, "t0", None) or getattr(ens, "t1", None)
        if t_tgt is None:
            raise ValueError(
                "temperature-mode NEP needs a thermostatted ensemble"
            )
        self.potentials = [
            p._replace(temperature=float(t_tgt))
            if isinstance(p, _NEP) and p.model.model_type == 3
            else p
            for p in self.potentials
        ]
        self.ff = dataclasses.replace(
            self.ff, potentials=tuple(self.potentials)
        )

    def kw_run(self, args):
        self._require_state()
        n_steps = int(args[0])
        if getattr(self, "_deposit", None) is not None:
            self._prepare_deposit(n_steps)
        if self.ensemble is None:
            self.ensemble = NVE()
        if isinstance(self.ensemble, tuple):  # PIMD family
            return self._run_pimd(n_steps)
        mode = getattr(self, "engine_mode", "auto")
        if mode in ("dense", "auto"):
            ens = self.ensemble
            import dataclasses as _dc

            if hasattr(ens, "n_steps"):
                ens = _dc.replace(ens, n_steps=n_steps)
            if self.mobile_mask is not None and hasattr(ens, "mobile"):
                ens = _dc.replace(ens, mobile=self.mobile_mask)
            reason = (
                self._dense_route_reason(ens) if mode == "auto" else None
            )
            if reason is None:
                self._wire_nep_temperature(ens)
                return self._run_dense(n_steps, ens)
            self.log(f"engine auto: list path ({reason})")
        ens = self.ensemble
        import dataclasses

        # temperature ramp length = this run's steps
        if hasattr(ens, "n_steps"):
            ens = dataclasses.replace(ens, n_steps=n_steps)
        if self.mobile_mask is not None and hasattr(ens, "mobile"):
            ens = dataclasses.replace(ens, mobile=self.mobile_mask)
        if getattr(self, "move_pin", None) is not None and hasattr(ens, "pinned"):
            ens = dataclasses.replace(ens, pinned=self.move_pin)
        deform = getattr(self, "deform", None)
        if deform is not None:
            from gpumd_tpu.integrate.ensembles.deform import DeformWrapper

            ens = DeformWrapper(inner=ens, rate=deform)

        self._wire_nep_temperature(ens)

        intervals = [p.interval for p in self.properties] + [
            m.interval for m in self.measure_props
        ]
        mc = getattr(self, "mc", None)
        if mc is not None:
            intervals.append(mc.num_steps_md)
            mc_trials = mc.make_trials(self.ff)
            import jax as _jax

            mc_key = _jax.random.PRNGKey(mc.seed)
            mc_accept_total = 0
            mc_trials_total = 0
        chunk = _bounded_chunk(
            math.gcd(*intervals) if intervals else n_steps, n_steps)

        needs_heat = any(
            getattr(m, "needs_heat", False) for m in self.measure_props
        )
        needs_stress = any(
            getattr(m, "needs_stress", False) for m in self.measure_props
        )
        onsager_props = [
            m for m in self.measure_props
            if getattr(m, "needs_onsager", False)
        ]
        from gpumd_tpu.measure.properties import heat_current_5, stress_6

        is_ti = hasattr(ens, "csv_name")
        if is_ti and (needs_heat or needs_stress):
            raise ValueError("TI runs do not support heat/stress observers")
        if is_ti:
            observer = lambda s, a: ens.observe(s, a)  # noqa: E731
        elif needs_heat or needs_stress or onsager_props:
            from gpumd_tpu.measure.properties import onsager_flux

            mp = onsager_props[0] if onsager_props else None
            observer = lambda s: (  # noqa: E731
                heat_current_5(s) if needs_heat else 0,
                stress_6(s) if needs_stress else 0,
                onsager_flux(s, mp.mass_type, mp.num_types) if mp else 0,
            )
        else:
            observer = lambda s: 0  # noqa: E731

        # loud neighbor-capacity check: the reference aborts on overflow
        # (ref: nep.cu neighbor.out diagnostics / abort); a silently
        # truncated list corrupts forces
        _nbr0 = self.ff.neighbor.build(
            self.state.box.wrap(self.state.position), self.state.box,
            self.state.mask,
        )
        _cnt = int(np.asarray(_nbr0.count).max())
        if _cnt > _nbr0.idx.shape[1]:
            raise RuntimeError(
                f"neighbor overflow: an atom has {_cnt} neighbors but the "
                f"list capacity is {_nbr0.idx.shape[1]}; increase mn"
            )
        # neighbor.out occupancy diagnostics (ref: nep.cu:1014-1034 logs
        # every 1000 calls; the static-shape list here is built per run
        # block, so one row per `run` records the same information)
        _counts = np.asarray(_nbr0.count)[np.asarray(self.state.mask) > 0]
        fnb = self._file("neighbor.out")
        fnb.write(
            f"step {self.global_step}: min {int(_counts.min())} "
            f"mean {float(_counts.mean()):.1f} max {int(_counts.max())} "
            f"capacity {_nbr0.idx.shape[1]}\n"
        )
        fnb.flush()
        del _nbr0
        _prof_dir = os.environ.get("GPUMD_PROFILE", "")
        if _prof_dir:
            # jax.profiler trace around the run (view with XProf/TensorBoard)
            jax.profiler.start_trace(_prof_dir)
        state = jax.jit(self.ff.compute)(self.state)
        cache = (
            jax.jit(self.ff.refresh_cache)(state) if self.ff.skin > 0 else None
        )
        runner = MDRunner(self.ff, ens, self.dt, chunk, observer=observer,
                          drivers=tuple(self.drivers))
        aux = None
        t0 = time.time()
        done = 0
        while done < n_steps:
            step0 = self.global_step
            state, (aux, cache), obs = runner(state, aux=aux, cache=cache)
            self._ens_aux = aux  # processors read e.g. heat-bath e_transfer
            if is_ti:
                fcsv = self._file(ens.csv_name, ens.csv_header)
                for row in ens.csv_rows(obs, self._n):
                    fcsv.write(row)
                fcsv.flush()
            done += chunk
            self.global_step += chunk
            self.state = state
            # NaN guard: the reference aborts on non-finite energies (the
            # CUDA build's debug checks); one scalar host-sync per chunk.
            _pe = float(jnp.sum(state.potential_energy * state.mask))
            if not np.isfinite(_pe):
                raise RuntimeError(
                    f"non-finite potential energy at step "
                    f"{self.global_step}: the system blew up (check "
                    f"time_step, initial overlaps, or neighbor capacity)"
                )
            # 10%-progress prints (ref: run.cu:313-317)
            decile = max(n_steps // 10, 1)
            if done % decile < chunk and n_steps >= 10:
                self.log(f"    {int(100 * done / n_steps)}% of the run "
                         f"completed ({done}/{n_steps} steps)")
            if needs_heat or needs_stress or onsager_props:
                j5 = np.asarray(obs[0]) if needs_heat else None
                s6 = np.asarray(obs[1]) if needs_stress else None
                ons = np.asarray(obs[2]) if onsager_props else None
                for m in self.measure_props:
                    if getattr(m, "needs_heat", False):
                        m.consume_heat(j5, step0)
                        if hasattr(m, "maybe_output"):
                            m.maybe_output(self)
                    if getattr(m, "needs_stress", False):
                        m.consume_stress(s6, step0)
                    if getattr(m, "needs_onsager", False):
                        m.consume_onsager(ons, step0)
                        m.maybe_output(self)
            for m in self.measure_props:
                if hasattr(m, "sample_state") and done % m.interval == 0:
                    m.sample_state(self, state, self.global_step)
            if mc is not None and done % mc.num_steps_md == 0:
                frac = done / max(n_steps, 1)
                t_now = mc.t_initial + (mc.t_final - mc.t_initial) * frac
                state, mc_key, na = mc_trials(state, mc_key, t_now)
                # type changes require fresh per-type energies next step;
                # the neighbor cache is geometric and stays valid.
                self.state = state
                mc_accept_total += int(na)
                mc_trials_total += mc.num_steps_mc
                # per-block acceptance + (sgc/vcsgc) concentrations
                # (ref: mc_ensemble_sgc.cu mc_output tail)
                row = f"{self.global_step}  {int(na) / mc.num_steps_mc:.6f}"
                if mc.sgc_types:
                    import numpy as _np

                    tarr = _np.asarray(state.type)
                    marr = _np.asarray(state.mask) > 0
                    nr = max(int(marr.sum()), 1)
                    for tt in mc.sgc_types:
                        row += f" {int(((tarr == tt) & marr).sum()) / nr:.6f}"
                fmc = self._file("mcmd.out")
                fmc.write(row + "\n")
                fmc.flush()
            for prop in self.properties:
                if done % prop.interval == 0:
                    prop.process(self, state, self.global_step)
                    state = self.state  # allow processors to mutate
        jax.block_until_ready(state.position)
        wall = time.time() - t0
        rate = self._n * n_steps / max(wall, 1e-9)
        self.log(f"Speed of this run = {rate:.5g} atom*step/second")
        if _prof_dir:
            jax.profiler.stop_trace()
            self.log(f"profiler trace written to {_prof_dir}")
        # TTM electron-temperature snapshot (overwrite mode,
        # ref: ttm_electron_temperature_out.rst / ensemble_ttm.cu output)
        if aux is not None and isinstance(aux, dict) and "t_e" in aux:
            nx_e, ny_e, nz_e = ens.grid
            te = np.asarray(aux["t_e"]).reshape(nz_e, ny_e, nx_e)
            with open(
                os.path.join(self.workdir, "ttm_electron_temperature.out"),
                "w",
            ) as fte:
                fte.write("# electron temperature snapshots for TTM\n")
                fte.write(f"# nx {nx_e} ny {ny_e} nz {nz_e}\n")
                fte.write(f"# output_interval {ens.out_interval} step(s)\n")
                fte.write("# columns: ix iy iz T_e[K]\n")
                fte.write(f"# step {self.global_step}\n")
                for iz in range(nz_e):
                    for iy in range(ny_e):
                        for ix in range(nx_e):
                            fte.write(
                                f"{ix} {iy} {iz} {te[iz, iy, ix]:.6f}\n"
                            )
        if is_ti and getattr(ens, "yaml_name", None):
            summary = ens.free_energy(state, aux)
            fy = self._file(ens.yaml_name)
            for k2, v2 in summary.items():
                fy.write(f"{k2}: {v2:f}\n")
            fy.flush()
            self.log(
                f"{type(ens).__name__}: F = {summary['F']:.6f} eV/atom "
                f"(G {summary['G']:.6f})"
            )
        # reset per-run observers (ref: run.cu:329-340 finalize())
        for m in self.measure_props:
            m.postprocess(self)
        self.measure_props = []
        for prop in self.properties:
            if prop.finalize:
                prop.finalize(self)
        self.properties = []
        self.drivers = []
        # HNEMD/HNEMDEC driving forces are per-run (reset like the reference)
        if self.ff is not None and (
            self.ff.hnemd_fe is not None or self.ff.hnemdec_mode is not None
        ):
            import dataclasses

            self.ff = dataclasses.replace(
                self.ff, hnemd_fe=None, hnemdec_mode=None,
                hnemdec_fe=None, hnemdec_coef=None,
            )

    def kw_replicate(self, args):
        """replicate cx cy cz: build a supercell (basis-inner atom order so
        compute_phonon's label = n %% num_basis convention holds;
        ref: src/main_gpumd/replicate.cu)."""
        import dataclasses

        cx, cy, cz = int(args[0]), int(args[1]), int(args[2])
        f = self.frame
        lat = np.asarray(f.lattice)
        cells = np.array(
            [[i, j, k] for i in range(cx) for j in range(cy) for k in range(cz)]
        )
        shifts = cells @ lat  # (C, 3)
        n0 = f.n_atoms
        pos = (shifts[:, None, :] + f.positions[None, :, :]).reshape(-1, 3)
        symbols = [s for _ in range(len(cells)) for s in f.symbols]
        self.frame = dataclasses.replace(
            f,
            positions=pos,
            symbols=symbols,
            lattice=lat * np.array([cx, cy, cz])[:, None],
            velocities=np.tile(f.velocities, (len(cells), 1))
            if f.velocities is not None else None,
            groups=np.tile(f.groups, (len(cells), 1))
            if f.groups is not None else None,
            masses=np.tile(f.masses, len(cells))
            if f.masses is not None else None,
        )
        self.symbols = symbols
        self._n = len(pos)
        self.box = Box.from_lattice(self.frame.lattice, pbc=f.pbc)
        self.replicate_cxyz = (cx, cy, cz)
        from gpumd_tpu.model.groups import Groups

        self.groups = Groups(self.frame.groups, self._n)
        if self.potentials:  # rebuild state with new geometry
            types = self._types_from_symbols()
            self.state = make_state(
                self.frame.positions, self.frame.default_masses(), types,
                self.box, n_pad=self._n, track_unwrapped=True,
            )
            self.ff = ForceField.create(
                self.potentials, self.box, self._n,
                mn=_auto_mn(self.potentials, self._n, self.box), skin=1.0,
            )
        self.log(f"replicate: {cx} x {cy} x {cz} -> {self._n} atoms")

    def kw_compute_phonon(self, args):
        """compute_phonon <displacement>: dispersion along kpoints.in ->
        omega2.out (ref: hessian.cu:494-507). Requires a prior `replicate`
        (or a primitive-cell model with cxyz = 1 1 1)."""
        self._require_state()
        from gpumd_tpu.phonon.hessian import compute_phonon_dispersion

        displacement = float(args[0])
        cxyz = getattr(self, "replicate_cxyz", (1, 1, 1))
        compute_phonon_dispersion(
            self.ff, self.state, cxyz, displacement, workdir=self.workdir
        )
        self.log("compute_phonon: omega2.out written")

    def kw_fix(self, args):
        """fix [grouping_method] group_id: freeze a group
        (ref: integrate.cu:1272-1300)."""
        if self.groups.n_methods == 0:
            raise ValueError("cannot use 'fix' without grouping methods")
        if len(args) == 2:
            method, gid = int(args[0]), int(args[1])
        else:
            method, gid = 0, int(args[0])
        fixed = self.groups.mask(method, gid)
        self.mobile_mask = 1.0 - fixed
        self.log(f"fix: group {gid} (method {method}) frozen")

    def kw_move(self, args):
        """move [method] group vx vy vz (A/fs): constant-velocity group
        (ref: integrate.cu:1315-1378). Requires a fixed group too."""
        if len(args) == 5:
            method, gid = int(args[0]), int(args[1])
            v = [float(x) for x in args[2:5]]
        else:
            method, gid = 0, int(args[0])
            v = [float(x) for x in args[1:4]]
        mask = np.asarray(self.groups.mask(method, gid))
        vel = np.asarray(v) * TIME_UNIT_CONVERSION  # A/fs -> natural
        self.move_pin = (mask, vel)
        self.log(f"move: group {gid} at {v} A/fs")

    def kw_deform(self, args):
        """deform rate [rx ry rz] dx dy dz: box strain rate in A/step on the
        flagged directions (ref: integrate.cu:1381-1420)."""
        if len(args) == 4:
            rates = [float(args[0])] * 3
            flags = [int(x) for x in args[1:4]]
        else:
            rates = [float(x) for x in args[0:3]]
            flags = [int(x) for x in args[3:6]]
        self.deform = tuple(
            r if f else 0.0 for r, f in zip(rates, flags)
        )
        self.log(f"deform: {self.deform} A/step")

    def kw_compute_chunk(self, args):
        """compute_chunk sample_int output_int bin/1d|2d|3d (axis lower
        delta)... props... -> compute_chunk.out
        (ref: compute_chunk.cu:147-350).

        Row format per chunk per output: chunk_id coord(s) count props...
        Temperature from per-chunk kinetic energy; density/number uses the
        chunk volume; velocities/forces are per-atom chunk averages."""
        sample_interval = int(args[0])
        output_interval = int(args[1])
        style = args[2]
        ndim = {"bin/1d": 1, "bin/2d": 2, "bin/3d": 3}[style]
        vol = float(self.box.volume)
        thick = np.asarray(self.box.thickness(), float)
        axes, deltas, nlayers, box_len = [], [], [], []
        i = 3
        for _ in range(ndim):
            ax = {"x": 0, "y": 1, "z": 2}[args[i]]
            if args[i + 1] != "lower":
                raise ValueError("compute_chunk: origin must be lower")
            delta = float(args[i + 2])
            axes.append(ax)
            deltas.append(delta)
            bl = thick[ax]
            box_len.append(bl)
            nlayers.append(max(int(np.ceil(bl / delta)), 1))
            i += 3
        props = list(args[i:])
        known = ("temperature", "density/number", "density/mass",
                 "vx", "vy", "vz", "fx", "fy", "fz")
        for p in props:
            if p not in known:
                raise ValueError(f"compute_chunk: invalid property {p!r}")
        nchunk = int(np.prod(nlayers))

        def bin_width(d, k):
            rem = box_len[d] - (nlayers[d] - 1) * deltas[d]
            return deltas[d] if k < nlayers[d] - 1 else rem

        def bin_center(d, k):
            if k < nlayers[d] - 1:
                return (k + 0.5) * deltas[d]
            rem = box_len[d] - (nlayers[d] - 1) * deltas[d]
            return (nlayers[d] - 1) * deltas[d] + rem * 0.5

        # chunk volumes + centers, reference ordering (fastest axis first)
        volumes = np.zeros(nchunk)
        coords = np.zeros((nchunk, ndim))
        grids = [range(nl) for nl in nlayers]
        idx2 = 0
        import itertools

        for combo in itertools.product(*reversed(grids)):
            combo = tuple(reversed(combo))  # (i0, i1, i2) fastest first
            if ndim == 1:
                w = (vol / box_len[0]) * bin_width(0, combo[0])
            elif ndim == 2:
                third = 3 - axes[0] - axes[1]
                w = bin_width(0, combo[0]) * bin_width(1, combo[1]) * thick[third]
            else:
                w = np.prod([bin_width(d, combo[d]) for d in range(3)])
            volumes[idx2] = w
            coords[idx2] = [bin_center(d, combo[d]) for d in range(ndim)]
            idx2 += 1

        acc = {
            "count": np.zeros(nchunk),
            "vals": np.zeros((nchunk, len(props))),
            "n": 0,
        }
        fout = self._file("compute_chunk.out")

        def process(session, state, step):
            from gpumd_tpu.units import K_B

            pos = np.asarray(state.box.wrap(state.position))
            mask = np.asarray(state.mask) > 0
            bins = np.zeros(pos.shape[0], np.int64)
            mult = 1
            for d in range(ndim):
                b = (pos[:, axes[d]] / deltas[d]).astype(np.int64)
                b = np.clip(b, 0, nlayers[d] - 1)
                bins += b * mult
                mult *= nlayers[d]
            bins = np.where(mask, bins, nchunk)  # padding -> overflow bin
            acc["count"] += np.bincount(bins, minlength=nchunk + 1)[:nchunk]
            v = np.asarray(state.velocity)
            f = np.asarray(state.force)
            m = np.asarray(state.mass)
            for j, p in enumerate(props):
                if p == "temperature":
                    val = 0.5 * m * (v**2).sum(axis=-1)
                elif p == "density/number":
                    val = np.ones_like(m)
                elif p == "density/mass":
                    val = m
                elif p[0] == "v":
                    val = v[:, "xyz".index(p[1])]
                else:
                    val = f[:, "xyz".index(p[1])]
                acc["vals"][:, j] += np.bincount(
                    bins, weights=val * mask, minlength=nchunk + 1
                )[:nchunk]
            acc["n"] += 1
            if acc["n"] % output_interval == 0:
                ns = acc["n"]
                for c in range(nchunk):
                    cnt = acc["count"][c] / ns
                    row = [f"{c} "]
                    row += [f"{coords[c][d]:.6f} " for d in range(ndim)]
                    row.append(f"{cnt:.1f} ")
                    for j, p in enumerate(props):
                        s = acc["vals"][c, j] / ns
                        if p == "temperature":
                            t = (2.0 * s / (K_B * 3.0 * cnt)) if cnt > 0 else 0.0
                            row.append(f"{t:.10e} ")
                        elif p == "density/number":
                            row.append(f"{cnt / volumes[c]:.10e} ")
                        elif p == "density/mass":
                            row.append(f"{s / volumes[c]:.10e} ")
                        else:
                            row.append(f"{s / cnt if cnt > 0 else 0.0:.10e} ")
                    fout.write("".join(row) + "\n")
                fout.flush()
                acc["count"][:] = 0
                acc["vals"][:] = 0
                acc["n"] = 0

        self.properties.append(PropertyRequest(sample_interval, process))
        self.log(f"compute_chunk {args}")

    def kw_compute(self, args):
        """compute <method> <sample_int> <output_int> temperature|potential|
        force|virial|jp|jk|momentum ... -> compute.out.

        Column layout matches the reference (ref: compute.cu:369-560): the
        quantity order is fixed (T, U, F, W, jp, jk, p) regardless of the
        keyword order; per quantity one column per group.  All columns are
        GROUP SUMS time-averaged over the output window, except temperature
        which is a per-atom average; when temperature is requested the two
        cumulative bath energies (source, sink) are appended — that pair is
        the NEMD heat-flux measurement."""
        import jax.numpy as jnp_

        method = int(args[0])
        sample_interval = int(args[1])
        output_interval = int(args[2])
        quantities = set(args[3:])
        known = {"temperature", "potential", "force", "virial", "jp", "jk",
                 "momentum"}
        bad = quantities - known
        if bad:
            raise ValueError(f"compute: unknown quantities {sorted(bad)}")
        onehot = self.groups.onehot(method)
        sizes = np.maximum(np.asarray(self.groups.sizes(method)), 1)
        acc = {"count": 0, "rows": []}
        f = self._file("compute.out")

        def process(session, state, step):
            from gpumd_tpu.units import K_B

            row = []
            oh = np.asarray(onehot)
            v = np.asarray(state.velocity)
            mass = np.asarray(state.mass)
            if "temperature" in quantities:
                ek2 = mass * (v**2).sum(axis=-1)
                row += list((ek2 @ oh) / (3.0 * sizes * K_B))
            if "potential" in quantities:
                row += list(np.asarray(state.potential_energy) @ oh)
            if "force" in quantities:
                fc = np.asarray(state.force)
                for k in range(3):
                    row += list(fc[:, k] @ oh)
            if "virial" in quantities:
                w = np.asarray(state.virial)  # (N, 3, 3) row-major
                for a in range(3):
                    for b in range(3):
                        row += list(w[:, a, b] @ oh)
            if "jp" in quantities:
                w = np.asarray(state.virial)
                jp = np.einsum("nab,nb->na", w, v)
                for k in range(3):
                    row += list(jp[:, k] @ oh)
            if "jk" in quantities:
                e = 0.5 * mass * (v**2).sum(axis=-1) + np.asarray(
                    state.potential_energy
                )
                for k in range(3):
                    row += list((v[:, k] * e) @ oh)
            if "momentum" in quantities:
                for k in range(3):
                    row += list((mass * v[:, k]) @ oh)
            acc["rows"].append(row)
            acc["count"] += 1
            if acc["count"] % max(output_interval // sample_interval, 1) == 0:
                mean = np.mean(acc["rows"], axis=0)
                cols = list(mean)
                if "temperature" in quantities:
                    aux = getattr(session, "_ens_aux", None)
                    et = (
                        np.asarray(aux["e_transfer"])
                        if isinstance(aux, dict) and "e_transfer" in aux
                        else np.zeros(2)
                    )
                    cols += [float(et[0]), float(et[1])]
                f.write("".join(f"{x:15.6e}" for x in cols) + "\n")
                f.flush()
                acc["rows"] = []

        self.properties.append(PropertyRequest(
            sample_interval, process,
            needs_atom_virial=bool({"virial", "jp"} & quantities),
        ))
        self.log(f"compute: method {method} {sorted(quantities)}")

    def kw_minimize(self, args):
        self._require_state()
        from gpumd_tpu.minimize.minimizers import minimize_fire, minimize_sd

        method = args[0]
        tol = float(args[1])
        max_steps = int(args[2])
        # minimize fire tol steps [box_change [hydrostatic_strain]]
        # (ref: minimize.cu:80-116)
        box_change = len(args) > 3 and int(args[3]) == 1
        if box_change:
            if method != "fire":
                raise ValueError("box relaxation requires the fire minimizer")
            from gpumd_tpu.minimize.minimizers import minimize_fire_box

            hydro = len(args) > 4 and int(args[4]) == 1
            fn = functools.partial(minimize_fire_box, hydrostatic=hydro)
        else:
            fn = {"sd": minimize_sd, "fire": minimize_fire}.get(method)
            if fn is None:
                raise ValueError(f"unsupported minimizer {method!r}")
        runner = jax.jit(
            lambda st: fn(self.ff, st, tol, max_steps),
        )
        self.state, steps = runner(self.state)
        e = float(jnp.sum(self.state.potential_energy * self.state.mask))
        self.log(
            f"minimize {method}: {int(steps)} steps, U = {e:.10f} eV"
        )

    def kw_dftd3(self, args):
        """dftd3 <functional> rc_potential rc_cn: attach the D3(BJ)
        dispersion term to the loaded potential (ref: nep.cu:45-73 scans
        run.in for this keyword; here it is first-class)."""
        from gpumd_tpu.potentials.dftd3 import DFTD3

        d3 = DFTD3.create(
            args[0], float(args[1]), float(args[2]), self.type_names
        )
        if self.ff is None:
            raise ValueError("dftd3 must come after the potential keyword")
        import dataclasses

        pots = self.ff.potentials + (d3,)
        from gpumd_tpu.forcefield import ForceField

        self.ff = ForceField.create(
            pots, self.box, self._n,
            mn=_auto_mn(pots, self._n, self.box), skin=self.ff.skin,
        )
        self.potentials = list(pots)
        self.log(f"dftd3 {args}")

    def kw_kspace(self, args):
        """kspace ewald|pppm: k-space backend for qNEP electrostatics
        (ref: nep_charge.cu:46-75 — scanned from run.in by the reference)."""
        method = args[0]
        if method not in ("ewald", "pppm"):
            raise ValueError("kspace method can only be ewald or pppm")
        self._kspace_method = method
        # apply to already-loaded charge potentials
        if getattr(self, "ff", None) is not None:
            import dataclasses

            pots = tuple(
                p._replace(kspace_method=method)
                if hasattr(p, "kspace_method") else p
                for p in self.ff.potentials
            )
            self.ff = dataclasses.replace(self.ff, potentials=pots)
        self.log(f"kspace {method}")

    def kw_mc(self, args):
        """mc canonical|sgc|vcsgc n_md n_mc T1 T2
        [num_types (sym mu_or_phi)... [kappa]] (ref: mc.cu:206-330)."""
        from gpumd_tpu.elements import mass_of
        from gpumd_tpu.mc.mcmd import MCMD

        kind = args[0]
        if kind not in ("canonical", "sgc", "vcsgc"):
            raise ValueError(f"invalid MC ensemble {kind!r}")
        n_md, n_mc = int(args[1]), int(args[2])
        t1, t2 = float(args[3]), float(args[4])
        sgc_types, sgc_mu, sgc_masses = (), (), ()
        kappa = 0.0
        if kind in ("sgc", "vcsgc"):
            ntypes = int(args[5])
            syms = args[6 : 6 + 2 * ntypes : 2]
            mus = args[7 : 7 + 2 * ntypes : 2]
            sgc_types = tuple(self.type_names.index(s) for s in syms)
            sgc_mu = tuple(float(m) for m in mus)
            sgc_masses = tuple(mass_of(s) for s in syms)
            if kind == "vcsgc":
                kappa = float(args[6 + 2 * ntypes])
        self.mc = MCMD(
            kind=kind, num_steps_md=n_md, num_steps_mc=n_mc,
            t_initial=t1, t_final=t2, sgc_types=sgc_types, sgc_mu=sgc_mu,
            sgc_masses=sgc_masses, kappa=kappa,
        )
        self.log(f"mc {args}")

    def _run_pimd(self, n_steps):
        """Run a PIMD/RPMD/TRPMD block (ref: run.cu:222-246 bead loop);
        beads ride a vmap axis here."""
        from gpumd_tpu.integrate.pimd import PIMDRunner

        ens = self.ensemble
        mode, nbeads, t, tc = ens[0], ens[1], ens[2], ens[3]
        t_end = ens[4] if len(ens) > 4 else t
        runner = PIMDRunner(
            ff=self.ff, base=self.state, n_beads=nbeads,
            temperature=t, coupling=tc, mode=mode,
        )
        st = runner.init(seed=7)
        t0 = time.time()
        beads_cfg = getattr(self, "_dump_beads", None)
        if beads_cfg is None:
            st, obs = runner.run(st, self.dt, n_steps, t_end=t_end)
        else:
            # chunk the run at the bead-dump interval
            # (ref: dump_beads.cu per-bead beads_dump_k.xyz frames)
            interval, has_vel, has_force = beads_cfg
            run_block = jax.jit(
                lambda s: runner.run(s, self.dt, interval)
            )
            done2 = 0
            obs = None
            while done2 < n_steps:
                st, obs = run_block(st)
                done2 += interval
                self._write_beads(st, nbeads, has_vel, has_force,
                                  (self.global_step + done2) * self.dt)
        jax.block_until_ready(st.position)
        wall = time.time() - t0
        self.global_step += n_steps
        # fold the centroid back into the classical state for dumps
        self.state = self.state._replace(
            position=jnp.mean(st.position, axis=0),
            velocity=jnp.mean(st.velocity, axis=0),
        )
        self._pimd_obs = {k: np.asarray(v) for k, v in obs.items()}
        rate = self._n * n_steps * nbeads / max(wall, 1e-9)
        self.log(
            f"PIMD({mode}, {nbeads} beads): bead-T "
            f"{float(self._pimd_obs['t_beads'][-1]):.1f} K; "
            f"Speed of this run = {rate:.5g} atom*step/second"
        )

    # ------------------------------------------------------- measure keywords

    def _ensemble_temperature(self) -> float:
        ens = self.ensemble
        if ens is not None and hasattr(ens, "t1"):
            return float(ens.t1)
        return 300.0

    def kw_compute_hac(self, args):
        from gpumd_tpu.measure.properties import HAC

        self.measure_props.append(
            HAC(int(args[0]), int(args[1]), int(args[2]), self.dt,
                self._ensemble_temperature())
        )
        self.log(f"compute_hac {args}")

    def kw_compute_lsqt(self, args):
        """compute_lsqt x|y|z Nm Ne E_start E_end E_max [sp3] ->
        lsqt_dos.out / lsqt_velocity.out / lsqt_sigma.out
        (ref: lsqt.cu:962-1035; `sp3` selects the 4-orbital carbon model,
        the reference's non-USE_GRAPHENE_TB build, lsqt.cu:554-643)."""
        from gpumd_tpu.measure.lsqt import LSQT

        model = "sp3" if (len(args) > 6 and args[6] == "sp3") else "graphene"
        rc = 2.6 if model == "sp3" else 2.1
        self.measure_props.append(
            LSQT(args[0], int(args[1]), int(args[2]), float(args[3]),
                 float(args[4]), float(args[5]), dt=self.dt, rc=rc,
                 model=model)
        )
        self.log(f"compute_lsqt {args}")

    def kw_compute_ic(self, args):
        """compute_ic sample_int Nc type charge -> ic.out
        (ref: iron_conductivity.cu)."""
        from gpumd_tpu.measure.properties import IonicConductivity

        self.measure_props.append(
            IonicConductivity(
                int(args[0]), int(args[1]), int(args[2]), float(args[3]),
                self.dt, self._ensemble_temperature(),
            )
        )
        self.log(f"compute_ic {args}")

    def kw_compute_dpdt(self, args):
        """compute_dpdt sample_interval -> dpdt.out: dP/dt = sum_i Z*_i v_i
        and the integrated polarization (ref: compute_dpdt.cu; needs a
        NEP-Charge model for the Born effective charges)."""
        import jax as _jax

        interval = int(args[0])
        pot = self.ff.potentials[0]
        if not hasattr(pot, "born_effective_charges"):
            raise ValueError("compute_dpdt needs a NEP-Charge model")

        @_jax.jit
        def dpdt_of(state):
            pos = state.box.wrap(state.position)
            nbr = self.ff.neighbor.build(pos, state.box, state.mask)
            bec = pot.born_effective_charges(state, nbr)  # (N, 3, 3)
            return jnp.einsum(
                "nab,nb->a", bec, state.velocity * state.mask[:, None]
            )

        from gpumd_tpu.units import TIME_UNIT_CONVERSION

        f = self._file("dpdt.out")
        f.write(f"# compute_dpdt {interval}\n# format_version 1\n")
        f.write(f"# num_atoms {self._n}\n")
        f.write(
            f"# dt_output {self.dt * interval * TIME_UNIT_CONVERSION:.10e} fs\n"
        )
        f.write("# columns time_fs dpdt_x dpdt_y dpdt_z P_x P_y P_z\n")
        acc = {"P": np.zeros(3)}

        def process(session, state, step):
            dp = np.asarray(dpdt_of(state))
            acc["P"] += dp * self.dt * interval
            t_fs = step * self.dt * TIME_UNIT_CONVERSION
            row = [t_fs, *dp, *acc["P"]]
            f.write(" ".join(f"{x:.10e}" for x in row) + "\n")
            f.flush()

        self.properties.append(PropertyRequest(interval, process))
        self.log(f"compute_dpdt {args}")

    def kw_compute_es(self, args):
        """compute_es sample_interval -> elactrostatic_force.out /
        elactrostatic_energy.out (reference filenames preserved, typo and
        all; ref: compute_es.cu): the electrostatic contribution = full
        qNEP output minus the short-range NEP+ZBL part, so the
        charge-gradient chain is included exactly."""
        import jax as _jax

        interval = int(args[0])
        pot = self.ff.potentials[0]
        if not hasattr(pot, "energy_and_charge"):
            raise ValueError("compute_es needs a NEP-Charge model")

        @_jax.jit
        def es_of(state):
            pos = state.box.wrap(state.position)
            st = state._replace(position=pos)
            nbr = self.ff.neighbor.build(pos, state.box, state.mask)
            full = pot.compute_with_state(st, nbr)
            t2 = st.type[nbr.idx]

            def e_short(r12):
                e, _ = pot.energy_and_charge(r12, st.type, t2)
                return e * st.mask

            e_s, vjp = _jax.vjp(e_short, nbr.r12)
            (p,) = vjp(st.mask)
            own = jnp.sum(p, axis=1)
            recv = _jax.ops.segment_sum(
                p.reshape(-1, 3), nbr.idx.reshape(-1),
                num_segments=st.mask.shape[0],
            )
            f_short = (own - recv) * st.mask[:, None]
            f_es = full.force - f_short
            e_es = jnp.sum((full.energy - e_s) * st.mask)
            return f_es, e_es

        ff_out = self._file("elactrostatic_force.out")
        fe_out = self._file("elactrostatic_energy.out")

        def process(session, state, step):
            f_es, e_es = es_of(state)
            f_np = np.asarray(f_es)
            mask = np.asarray(state.mask) > 0
            for r in f_np[mask]:
                ff_out.write(f"{r[0]:16.8e}{r[1]:16.8e}{r[2]:16.8e}\n")
            fe_out.write(f"{float(e_es):16.8e}\n")
            ff_out.flush()
            fe_out.flush()

        self.properties.append(PropertyRequest(interval, process))
        self.log(f"compute_es {args}")

    def kw_dump_beads(self, args):
        """dump_beads interval has_velocity has_force ->
        beads_dump_<k>.xyz per bead (ref: dump_beads.cu:36-90)."""
        self._dump_beads = (int(args[0]), bool(int(args[1])),
                            bool(int(args[2])))
        self.log(f"dump_beads {args}")

    def _write_beads(self, st, nbeads, has_vel, has_force, time_nat):
        mask = np.asarray(self.state.mask) > 0
        h = np.asarray(self.box.h)
        pbc = " ".join(
            "T" if p else "F" for p in np.asarray(self.box.pbc) > 0
        )
        lat = " ".join(f"{h[i, j]:.8f}" for j in range(3) for i in range(3))
        props = "species:S:1:pos:R:3"
        if has_vel:
            props += ":vel:R:3"
        if has_force:
            props += ":forces:R:3"
        from gpumd_tpu.units import TIME_UNIT_CONVERSION

        for k in range(nbeads):
            f = self._file(f"beads_dump_{k}.xyz")
            pos = np.asarray(st.position[k])[mask]
            vel = np.asarray(st.velocity[k])[mask] if has_vel else None
            frc = np.asarray(st.force[k])[mask] if has_force else None
            f.write(f"{int(mask.sum())}\n")
            f.write(
                f"Time={time_nat * TIME_UNIT_CONVERSION:.8f} "
                f'pbc="{pbc}" Lattice="{lat}" Properties={props}\n'
            )
            for i, sym in enumerate(np.asarray(self.symbols)[mask]):
                row = f"{sym} {pos[i, 0]:.8f} {pos[i, 1]:.8f} {pos[i, 2]:.8f}"
                if vel is not None:
                    row += f" {vel[i, 0]:.8f} {vel[i, 1]:.8f} {vel[i, 2]:.8f}"
                if frc is not None:
                    row += f" {frc[i, 0]:.8f} {frc[i, 1]:.8f} {frc[i, 2]:.8f}"
                f.write(row + "\n")
            f.flush()

    def kw_dump_cg(self, args):
        """dump_cg interval grouping_method -> train.xyz frames of
        coarse-grained beads: COM positions, window-averaged bead forces /
        energy / virial, + the missing-DoF ideal-gas virial correction
        (ref: dump_cg.cu)."""
        interval = int(args[0])
        gm = int(args[1])
        onehot = np.asarray(self.groups.onehot(gm))  # (N, Ngroups)
        nbeads = onehot.shape[1]
        # bead species = first member atom's symbol (ref: dump_cg.cu:352)
        labels = np.asarray(self.groups.labels)[:, gm]
        first_sym = []
        for b in range(nbeads):
            members = np.nonzero(labels == b)[0]
            first_sym.append(self.symbols[members[0]])
        acc = {"f": np.zeros((nbeads, 3)), "e": 0.0,
               "w": np.zeros((3, 3)), "n": 0}
        fout = self._file("train.xyz")

        def process(session, state, step):
            from gpumd_tpu.units import K_B

            n = self._n
            mask = np.asarray(state.mask)[:n] > 0
            f = np.asarray(state.force)[:n]
            acc["f"] += onehot.T @ f
            acc["e"] += float(
                np.asarray(state.potential_energy)[:n][mask].sum()
            )
            acc["w"] += np.asarray(
                jnp.sum(state.virial * state.mask[:, None, None], axis=0)
            )
            acc["n"] += 1
            if acc["n"] % interval != 0:
                return
            inv = 1.0 / acc["n"]
            m = np.asarray(state.mass)[:n]
            pos = np.asarray(
                state.unwrapped_position
                if state.unwrapped_position is not None else state.position
            )[:n]
            msum = onehot.T @ m
            com = (onehot.T @ (m[:, None] * pos)) / msum[:, None]
            t_now = self._ensemble_temperature()
            extra = (int(mask.sum()) - nbeads) * K_B * t_now
            h = np.asarray(state.box.h)
            pbc = " ".join(
                "T" if p else "F" for p in np.asarray(state.box.pbc) > 0
            )
            lat = " ".join(
                f"{h[i2, j2]:.8f}" for j2 in range(3) for i2 in range(3)
            )
            w = acc["w"] * inv
            wrow = [w[0, 0] + extra, w[0, 1], w[0, 2],
                    w[1, 0], w[1, 1] + extra, w[1, 2],
                    w[2, 0], w[2, 1], w[2, 2] + extra]
            fout.write(f"{nbeads}\n")
            fout.write(
                f'pbc="{pbc}" Lattice="{lat}" energy={acc["e"] * inv:.8f} '
                f'virial="{" ".join(f"{x:.8f}" for x in wrow)}" '
                "Properties=species:S:1:pos:R:3:forces:R:3\n"
            )
            for b in range(nbeads):
                fb = acc["f"][b] * inv
                fout.write(
                    f"{first_sym[b]} {com[b, 0]:.8f} {com[b, 1]:.8f} "
                    f"{com[b, 2]:.8f} {fb[0]:.8f} {fb[1]:.8f} {fb[2]:.8f}\n"
                )
            fout.flush()
            acc["f"][:] = 0.0
            acc["e"] = 0.0
            acc["w"][:] = 0.0
            acc["n"] = 0

        self.properties.append(PropertyRequest(1, process))
        self.log(f"dump_cg {args}")

    def kw_dump_shock_nemd(self, args):
        """dump_shock_nemd interval n bin_size d -> spatial histograms
        temperature/pxx/pyy/pzz/density/vp _hist.txt, one row per dump
        (ref: dump_shock_nemd.cu).  Per x-bin: COM-relative temperature,
        stress (virial + convective) in GPa, density g/cm3, COM vx km/s."""
        interval, bin_size = None, None
        i = 0
        while i < len(args):
            if args[i] == "interval":
                interval = int(args[i + 1])
            elif args[i] == "bin_size":
                bin_size = float(args[i + 1])
            else:
                raise ValueError(f"dump_shock_nemd: unknown {args[i]!r}")
            i += 2
        if interval is None or bin_size is None:
            raise ValueError("dump_shock_nemd needs interval and bin_size")
        lx = float(np.asarray(self.box.h)[0, 0])
        h = np.asarray(self.box.h)
        bins = int(lx / bin_size) + 1
        slice_vol = h[1, 1] * h[2, 2] * bin_size
        files = {
            name: self._file(f"{name}_hist.txt")
            for name in ("temperature", "pxx", "pyy", "pzz", "density", "vp")
        }

        def process(session, state, step):
            from gpumd_tpu.units import (
                K_B, PRESSURE_UNIT_CONVERSION, TIME_UNIT_CONVERSION,
            )

            mask = np.asarray(state.mask) > 0
            x = np.asarray(state.position)[:, 0]
            b = np.clip((x / bin_size).astype(np.int64), 0, bins - 1)
            b = np.where(mask, b, bins)
            m = np.asarray(state.mass)
            v = np.asarray(state.velocity)
            w = np.asarray(state.virial)
            mw = m * mask
            dens = np.bincount(b, weights=mw, minlength=bins + 1)[:bins]
            com = np.stack(
                [np.bincount(b, weights=mw * v[:, k], minlength=bins + 1)[:bins]
                 for k in range(3)], axis=1,
            )
            com = np.where(dens[:, None] > 1e-5, com / np.maximum(dens, 1e-30)[:, None], 0.0)
            vrel = v - com[np.minimum(b, bins - 1)]
            ke2 = mw * (vrel**2).sum(axis=1)
            temp = np.bincount(b, weights=ke2, minlength=bins + 1)[:bins]
            num = np.bincount(b, weights=mask.astype(float), minlength=bins + 1)[:bins]
            temp = np.where(num >= 20, temp / np.maximum(3 * num * K_B, 1e-30), temp)
            rows = {}
            for j, name in enumerate(("pxx", "pyy", "pzz")):
                pk = w[:, j, j] + mw * vrel[:, j] ** 2
                pv = np.bincount(b, weights=pk * mask, minlength=bins + 1)[:bins]
                rows[name] = pv / slice_vol * PRESSURE_UNIT_CONVERSION
            rows["temperature"] = temp
            rows["density"] = dens / slice_vol * 1.660538921  # g/cm3
            rows["vp"] = com[:, 0] / (0.01 * TIME_UNIT_CONVERSION)  # km/s
            for name, arr in rows.items():
                files[name].write(" ".join(f"{v2:f}" for v2 in arr) + "\n")
                files[name].flush()

        self.properties.append(
            PropertyRequest(interval, process, needs_atom_virial=True)
        )
        self.log(f"dump_shock_nemd {args}")

    def kw_compute_extrapolation(self, args):
        """compute_extrapolation asi_file <f> gamma_low x gamma_high x
        [check_interval n] [dump_interval n] -> extrapolation_dump.xyz
        (ref: extrapolation.cu:44-240).

        gamma_i = max |ASI[type_i] @ B_i| with B_i the per-atom ANN-parameter
        gradient (B-projection); structures with gamma in [low, high) are
        dumped; gamma > high aborts the run."""
        import jax as _jax

        kw = {"check_interval": 1, "dump_interval": 1,
              "gamma_low": 0.0, "gamma_high": 1e100}
        i = 0
        asi_file = None
        while i < len(args):
            k = args[i]
            if k == "asi_file":
                asi_file = args[i + 1]
            elif k in ("gamma_low", "gamma_high"):
                kw[k] = float(args[i + 1])
            elif k in ("check_interval", "dump_interval"):
                kw[k] = int(args[i + 1])
            else:
                raise ValueError(f"compute_extrapolation: bad token {k!r}")
            i += 2
        if asi_file is None:
            raise ValueError("compute_extrapolation needs asi_file")
        # parse ASI: blocks "Element shape1 shape2 <shape1*shape2 floats>"
        toks = open(os.path.join(self.workdir, asi_file)).read().split()
        asi_by_type = {}
        p = 0
        while p < len(toks):
            el = toks[p]
            s1, s2 = int(toks[p + 1]), int(toks[p + 2])
            vals = np.asarray([float(x) for x in toks[p + 3 : p + 3 + s1 * s2]])
            asi_by_type[self.type_names.index(el)] = vals.reshape(s1, s2)
            p += 3 + s1 * s2
        nep = self.ff.potentials[0]
        if not hasattr(nep, "b_projection"):
            raise ValueError("compute_extrapolation requires a NEP potential")
        bsize = nep.model.neurons * (nep.model.dim + 2)
        # per-atom ASI stack (types are static)
        asi = np.zeros((len(self.type_names), bsize, bsize))
        for t, m in asi_by_type.items():
            if m.shape != (bsize, bsize):
                raise ValueError(
                    f"ASI for type {t}: shape {m.shape} != ({bsize},{bsize})"
                )
            asi[t] = m
        asi_j = jnp.asarray(asi, jnp.float32)

        @_jax.jit
        def gamma_of(state):
            pos = state.box.wrap(state.position)
            nbr = self.ff.neighbor.build(pos, state.box, state.mask)
            t2 = state.type[nbr.idx]
            b = nep.b_projection(nbr.r12, state.type, t2)  # (N, bsize)
            g_full = jnp.einsum("nij,nj->ni", asi_j[state.type], b)
            return jnp.max(jnp.abs(g_full), axis=-1) * state.mask

        holder = {"last_dump": -(10**9)}
        fdump = self._file("extrapolation_dump.xyz")

        def process(session, state, step):
            gamma = np.asarray(gamma_of(state))
            mg = float(gamma.max())
            if mg >= kw["gamma_low"]:
                if step == 0 or step - holder["last_dump"] >= kw["dump_interval"]:
                    holder["last_dump"] = step
                    self._dump_gamma(fdump, state, gamma, mg)
            if mg > kw["gamma_high"]:
                self._dump_gamma(fdump, state, gamma, mg)
                raise RuntimeError(
                    f"extrapolation grade {mg:.4f} exceeds gamma_high "
                    f"at step {step}; terminating (ref: extrapolation.cu:207)"
                )

        self.properties.append(PropertyRequest(kw["check_interval"], process))
        self.log(f"compute_extrapolation {args}")

    def _dump_gamma(self, f, state, gamma, max_gamma):
        mask = np.asarray(state.mask) > 0
        pos = np.asarray(state.position)[mask]
        types = np.asarray(state.type)[mask]
        h = np.asarray(state.box.h)
        n = int(mask.sum())
        f.write(f"{n}\n")
        pbc = " ".join("T" if p else "F" for p in np.asarray(state.box.pbc) > 0)
        lat = " ".join(f"{h[i, j]:.8f}" for j in range(3) for i in range(3))
        f.write(
            f'max_gamma={max_gamma:.8f} pbc="{pbc}" Lattice="{lat}" '
            f"Properties=species:S:1:pos:R:3:gamma:R:1\n"
        )
        g = gamma[mask]
        for i in range(n):
            f.write(
                f"{self.type_names[types[i]]} {pos[i, 0]:.8f} "
                f"{pos[i, 1]:.8f} {pos[i, 2]:.8f} {g[i]:8f}\n"
            )
        f.flush()

    def kw_compute_gkma(self, args):
        """compute_gkma sample_int first_mode last_mode bin_size|f_bin_size x
        -> heatmode.out (ref: modal_analysis.cu:650-748)."""
        from gpumd_tpu.measure.properties import ModalAnalysis

        kw = {}
        if args[3] == "bin_size":
            kw["bin_size"] = int(args[4])
        elif args[3] == "f_bin_size":
            kw["f_bin_size"] = float(args[4])
        else:
            raise ValueError("compute_gkma: invalid binning keyword")
        self.measure_props.append(
            ModalAnalysis(
                "gkma", int(args[0]), int(args[1]), int(args[2]),
                eig_path=os.path.join(self.workdir, "eigenvector.in"), **kw,
            )
        )
        self.log(f"compute_gkma {args}")

    def kw_compute_hnema(self, args):
        """compute_hnema sample_int output_int fe_x fe_y fe_z first last
        bin_size|f_bin_size x -> kappamode.out; also applies the HNEMD
        driving force (ref: modal_analysis.cu:751-830)."""
        import dataclasses

        from gpumd_tpu.measure.properties import ModalAnalysis

        fe_vec = (float(args[2]), float(args[3]), float(args[4]))
        self.ff = dataclasses.replace(self.ff, hnemd_fe=fe_vec)
        fe = float(np.sqrt(sum(x * x for x in fe_vec)))
        kw = {}
        if args[7] == "bin_size":
            kw["bin_size"] = int(args[8])
        elif args[7] == "f_bin_size":
            kw["f_bin_size"] = float(args[8])
        else:
            raise ValueError("compute_hnema: invalid binning keyword")
        self.measure_props.append(
            ModalAnalysis(
                "hnema", int(args[0]), int(args[5]), int(args[6]),
                output_interval=int(args[1]), fe=fe,
                temperature=self._ensemble_temperature(),
                eig_path=os.path.join(self.workdir, "eigenvector.in"), **kw,
            )
        )
        self.log(f"compute_hnema {args}")

    def kw_compute_hnemd(self, args):
        import dataclasses

        from gpumd_tpu.measure.properties import HNEMDKappa

        fe = (float(args[1]), float(args[2]), float(args[3]))
        self.ff = dataclasses.replace(self.ff, hnemd_fe=fe)
        self.measure_props.append(
            HNEMDKappa(int(args[0]), fe, self.dt, self._ensemble_temperature())
        )
        self.log(f"compute_hnemd {args}")

    def kw_compute_hnemdec(self, args):
        """compute_hnemdec <mode> <output_interval> fe_x fe_y fe_z ->
        onsager.out (ref: hnemdec_kappa.cu:252-280, force.cu:355-422).
        mode 0 = heat flow; mode k in [1, num_types] = color flow of
        species k-1."""
        import dataclasses

        from gpumd_tpu.forcefield import hnemdec_coefficients
        from gpumd_tpu.measure.properties import HNEMDECOnsager
        from gpumd_tpu.units import K_B

        mode = int(args[0])
        interval = int(args[1])
        fe = (float(args[2]), float(args[3]), float(args[4]))
        num_types = max(1, len(self.type_names))
        if not (0 <= mode <= num_types):
            raise ValueError(f"compute_hnemdec: mode {mode} out of range")
        t = self._ensemble_temperature()
        coef, mass_type, factor = hnemdec_coefficients(
            mode, np.asarray(self.state.mass), np.asarray(self.state.type),
            num_types,
        )
        if mode == 0:
            coef = tuple(
                c * (K_B * t) if i % 2 == 1 else c
                for i, c in enumerate(coef)
            )
        self.ff = dataclasses.replace(
            self.ff, hnemdec_mode=mode, hnemdec_fe=fe, hnemdec_coef=coef,
        )
        prop = HNEMDECOnsager(mode, interval, fe, t, num_types, factor)
        prop.mass_type = mass_type
        self.measure_props.append(prop)
        self.log(f"compute_hnemdec {args}")

    def kw_compute_msd(self, args):
        from gpumd_tpu.measure.properties import MSD

        self.measure_props.append(MSD(int(args[0]), int(args[1]), self.dt))

    def kw_compute_sdc(self, args):
        from gpumd_tpu.measure.properties import SDC

        self.measure_props.append(SDC(int(args[0]), int(args[1]), self.dt))

    def kw_compute_dos(self, args):
        from gpumd_tpu.measure.properties import DOS

        num_points = None
        if "num_dos_points" in args:
            num_points = int(args[args.index("num_dos_points") + 1])
        self.measure_props.append(
            DOS(int(args[0]), int(args[1]), float(args[2]), self.dt,
                num_points=num_points)
        )

    def kw_dump_observer(self, args):
        """dump_observer observe|average thermo_int exyz_int has_vel has_force
        (ref: dump_observer.cu:81-130): evaluates every loaded potential on
        the trajectory, writing observer<k>.out thermo rows and
        observer<k>.xyz frames (active-learning ensemble disagreement)."""
        mode = args[0]
        if mode not in ("observe", "average"):
            raise ValueError("observer mode should be 'observe' or 'average'")
        self.observer_mode = mode
        self._rebuild_ff()
        int_thermo, int_exyz = int(args[1]), int(args[2])
        with_vel, with_force = args[3] == "1", args[4] == "1"
        if mode == "average":
            self.log("dump_observer: average mode (forces averaged)")
            return

        from gpumd_tpu.integrate.thermo import compute_thermo

        files = {}
        # cache one jitted evaluator per potential (a fresh jax.jit per
        # call would retrace every dump interval)
        _evals = {}

        def _compact_ok(session, pot):
            """Observer models ride the driver's compact plan + neighbor
            build when their cutoffs fit inside it (the cutoff functions
            zero contributions beyond the observer's own rc, and the
            driver's rc+skin list covers every pair the observer can see —
            same trick as the reference's shared neighbor pass,
            dump_observer.cu:29-80).  The active-learning committee case
            (same architecture, different weights) always qualifies."""
            from gpumd_tpu.engine.nep_compact import CompactSpec
            from gpumd_tpu.potentials.nep.model import NEP as _NEP

            drv = session.potentials[0]
            if not (isinstance(pot, _NEP) and isinstance(drv, _NEP)):
                return False
            try:
                CompactSpec.from_model(pot.model, pot.params)
            except NotImplementedError:
                return False
            if (pot.model.model_type == 3
                    and getattr(pot, "temperature", None) is None):
                return False  # unwired temperature model: list path errors
            return (
                tuple(pot.model.symbols) == tuple(drv.model.symbols)
                and pot.model.rc_radial_max <= drv.model.rc_radial_max + 1e-9
                and pot.model.rc_angular_max
                <= drv.model.rc_angular_max + 1e-9
            )

        def _eval(session, k, pot, state):
            ctx = getattr(session, "_dense_eval_ctx", None)
            if ctx is not None and _compact_ok(session, pot):
                md, carry = ctx
                key = ("compact", k)
                if key not in _evals:
                    from gpumd_tpu.engine.nep_compact import (
                        compact_nep_compute,
                    )

                    def run(c, p=pot, md=md):
                        out = compact_nep_compute(
                            c.state.position, c.state.type, c.state.mask,
                            c.state.box, md.cplan, c.idx, p.model, p.params,
                            per_atom_virial=False, interpret=md.interpret,
                            temperature=getattr(p, "temperature", None),
                        )
                        return out.energy, out.force, out.virial_total

                    _evals[key] = jax.jit(run)
                e_s, f_s, w_tot = _evals[key](carry)
                session._observer_compact_evals = getattr(
                    session, "_observer_compact_evals", 0) + 1
                n = session._n
                oid = np.asarray(carry.orig_id)
                valid = oid < n
                inv = np.zeros(n, np.int64)
                inv[oid[valid]] = np.nonzero(valid)[0]
                f = jnp.asarray(np.asarray(f_s)[inv])
                e = jnp.asarray(np.asarray(e_s)[inv])
                # compute_thermo only consumes the SUM of per-atom virials;
                # park the compact total on atom 0 (per-atom rows would
                # need the heavier per_atom_virial scatter variant)
                w = jnp.zeros((n, 3, 3), f.dtype).at[0].set(
                    jnp.asarray(w_tot))
                return state._replace(
                    force=f, potential_energy=e, virial=w,
                    heat_current=jnp.zeros_like(f),
                )
            if k not in _evals:
                _evals[k] = jax.jit(
                    lambda st, p=pot: session.ff._evaluate_with(st, p)
                )
            return _evals[k](state)

        def process(session, state, step):
            for k, pot in enumerate(session.potentials):
                out = _eval(session, k, pot, state)
                th = compute_thermo(out)
                p = np.asarray(th.pressure) * PRESSURE_UNIT_CONVERSION
                h = np.asarray(state.box.h)
                name = f"observer{k}.out"
                if name not in files:
                    files[name] = open(
                        os.path.join(session.workdir, name), "w"
                    )
                row = [
                    float(th.temperature), float(th.kinetic_energy),
                    float(th.potential_energy),
                    p[0, 0], p[1, 1], p[2, 2], p[1, 2], p[0, 2], p[0, 1],
                    h[0, 0], h[1, 0], h[2, 0], h[0, 1], h[1, 1], h[2, 1],
                    h[0, 2], h[1, 2], h[2, 2],
                ]
                files[name].write("".join(f"{x:20.10e}" for x in row) + "\n")
                files[name].flush()

        def process_exyz(session, state, step):
            for k, pot in enumerate(session.potentials):
                out = _eval(session, k, pot, state)
                n = session._n
                frame = XYZFrame(
                    symbols=session.symbols,
                    positions=np.asarray(state.box.wrap(state.position))[:n],
                    lattice=np.asarray(state.box.h).T,
                    pbc=session.frame.pbc,
                    velocities=(
                        np.asarray(state.velocity)[:n] / TIME_UNIT_CONVERSION
                        if with_vel else None
                    ),
                    forces=np.asarray(out.force)[:n] if with_force else None,
                )
                write_xyz(
                    os.path.join(session.workdir, f"observer{k}.xyz"), frame,
                    append=True, with_velocities=with_vel,
                    with_forces=with_force,
                )

        self.properties.append(PropertyRequest(int_thermo, process))
        self.properties.append(PropertyRequest(int_exyz, process_exyz))
        self.log(f"dump_observer {args}")

    def kw_active(self, args):
        """active check_interval has_velocity has_force has_uncertainty
        threshold (ref: active.cu:118-170): per-atom force uncertainty
        across the loaded NEP ensemble; frames exceeding the threshold go
        to active.xyz (on-the-fly active learning)."""
        interval = int(args[0])
        with_vel = args[1] == "1"
        with_force = args[2] == "1"
        threshold = float(args[4])
        if len(self.potentials) < 2:
            raise ValueError("active learning needs >= 2 potentials")

        _evals = {}

        def process(session, state, step):
            forces = []
            for k, pot in enumerate(session.potentials):
                if k not in _evals:
                    _evals[k] = jax.jit(
                        lambda st, p=pot: session.ff._evaluate_with(st, p)
                    )
                out = _evals[k](state)
                forces.append(np.asarray(out.force)[: session._n])
            fstack = np.stack(forces)  # (M, N, 3)
            var = fstack.var(axis=0).sum(axis=-1)  # population variance
            unc = np.sqrt(var)
            max_unc = float(unc.max())
            if max_unc > threshold:
                n = session._n
                frame = XYZFrame(
                    symbols=session.symbols,
                    positions=np.asarray(state.box.wrap(state.position))[:n],
                    lattice=np.asarray(state.box.h).T,
                    pbc=session.frame.pbc,
                    velocities=(
                        np.asarray(state.velocity)[:n] / TIME_UNIT_CONVERSION
                        if with_vel else None
                    ),
                    forces=fstack[0] if with_force else None,
                )
                write_xyz(
                    os.path.join(session.workdir, "active.xyz"), frame,
                    append=True, with_velocities=with_vel,
                    with_forces=with_force,
                    extra_info={"uncertainty": f"{max_unc:.6f}"},
                )
            f = self._file("active.out")
            f.write(f"{step} {max_unc:g}\n")
            f.flush()

        self.properties.append(PropertyRequest(interval, process))
        self.log(f"active {args}")

    def kw_compute_viscosity(self, args):
        from gpumd_tpu.measure.properties import Viscosity

        self.measure_props.append(
            Viscosity(int(args[0]), int(args[1]), self.dt,
                      self._ensemble_temperature())
        )
        self.log(f"compute_viscosity {args}")

    def kw_dump_dipole(self, args):
        """dump_dipole interval -> dipole.out using the second loaded
        potential (the TNEP dipole observer, ref: dump_dipole.cu)."""
        interval = int(args[0])
        tnep = next(
            (p for p in self.potentials
             if getattr(getattr(p, "model", None), "model_type", 0) == 1),
            None,
        )
        if tnep is None:
            raise ValueError("dump_dipole needs a loaded *_dipole potential")
        f = self._file("dipole.out")

        def process(session, state, step):
            nbr = session.ff.neighbor.build(
                state.box.wrap(state.position), state.box, state.mask
            )
            mu = np.asarray(tnep.dipole(state.type, nbr, state.mask))
            f.write(f"{step}" + "".join(f"{x:20.10e}" for x in mu) + "\n")
            f.flush()

        self.properties.append(PropertyRequest(interval, process))
        self.log(f"dump_dipole every {interval}")

    def kw_dump_polarizability(self, args):
        """dump_polarizability interval -> polarizability.out (6 Voigt
        components) from the loaded *_polarizability observer."""
        interval = int(args[0])
        tnep = next(
            (p for p in self.potentials
             if getattr(getattr(p, "model", None), "model_type", 0) == 2),
            None,
        )
        if tnep is None:
            raise ValueError(
                "dump_polarizability needs a *_polarizability potential"
            )
        f = self._file("polarizability.out")

        def process(session, state, step):
            nbr = session.ff.neighbor.build(
                state.box.wrap(state.position), state.box, state.mask
            )
            p = np.asarray(tnep.polarizability(state.type, nbr, state.mask))
            row = [p[0, 0], p[1, 1], p[2, 2], p[0, 1], p[1, 2], p[0, 2]]
            f.write(f"{step}" + "".join(f"{x:20.10e}" for x in row) + "\n")
            f.flush()

        self.properties.append(PropertyRequest(interval, process))
        self.log(f"dump_polarizability every {interval}")

    def kw_compute_shc(self, args):
        from gpumd_tpu.measure.properties import SHC

        group_mask = None
        if len(args) >= 8 and args[5] == "group":
            method, gid = int(args[6]), int(args[7])
            group_mask = np.asarray(self.groups.mask(method, gid))
        self.measure_props.append(
            SHC(int(args[0]), int(args[1]), int(args[2]), int(args[3]),
                float(args[4]), self.dt, group_mask=group_mask)
        )
        self.log(f"compute_shc {args}")

    def kw_add_force(self, args):
        """add_force <gm> <gid> (fx fy fz | file) (ref: add_force.cu)."""
        from gpumd_tpu.integrate.drivers import AddForce, parse_table_or_values

        gm, gid = int(args[0]), int(args[1])
        table = parse_table_or_values(args[2:], self.workdir)
        self.drivers.append(
            AddForce(gmask=np.asarray(self.groups.mask(gm, gid)), table=table)
        )
        self.log(f"add_force {args}")

    def kw_add_efield(self, args):
        """add_efield <gm> <gid> (Ex Ey Ez | file) [charge|bec]
        (ref: add_efield.cu)."""
        from gpumd_tpu.integrate.drivers import AddEfield, parse_table_or_values

        gm, gid = int(args[0]), int(args[1])
        rest = list(args[2:])
        mode = "charge"
        if rest and rest[-1] in ("charge", "bec"):
            mode = rest.pop()
        table = parse_table_or_values(rest, self.workdir)
        bec_fn = None
        if mode == "bec":
            pot = next(
                (p for p in self.potentials
                 if hasattr(p, "born_effective_charges")), None,
            )
            if pot is None:
                raise ValueError("add_efield bec mode needs a qNEP model")
            ff = self.ff

            def bec_fn(state, _pot=pot, _ff=ff):
                nbr = _ff.neighbor.build(
                    state.box.wrap(state.position), state.box, state.mask
                )
                return _pot.born_effective_charges(state, nbr)

        self.drivers.append(
            AddEfield(
                gmask=np.asarray(self.groups.mask(gm, gid)), table=table,
                use_bec=(mode == "bec"), bec_fn=bec_fn,
            )
        )
        self.log(f"add_efield {args}")

    def kw_deposit(self, args):
        """deposit interval direction hmin hmax atom type number velocity
        (ref: deposition.cu:48-170, 440-470): every `interval` steps,
        `number` new atoms of `type` appear at random lateral positions
        with the deposition-axis coordinate in [hmin, hmax] and velocity
        `velocity` (natural units) along the axis.  TPU-native: the state
        is pre-padded with masked atoms at run start and deposition is a
        mask-activation event — static shapes throughout."""
        interval = int(args[0])
        direction = int(args[1])
        hmin, hmax = float(args[2]), float(args[3])
        if args[4] != "atom":
            raise ValueError("deposit: only 'atom' mode supported")
        atype = int(args[5])
        number = int(args[6])
        vel = float(args[7])
        self._deposit = dict(
            interval=interval, direction=direction, hmin=hmin, hmax=hmax,
            type=atype, number=number, velocity=vel, next_slot=None,
            rng=np.random.default_rng(777),
        )
        self.log(f"deposit {args}")

    def _prepare_deposit(self, n_steps):
        """Grow the padded state for this run's deposition events and
        register the activation processor."""
        dep = self._deposit
        events = n_steps // dep["interval"]
        need = events * dep["number"]
        if need <= 0:
            return
        old_n = self._n
        new_n = old_n + need
        st = self.state

        def pad(a, fill=0.0):
            if a is None:
                return None
            pad_shape = (need,) + tuple(a.shape[1:])
            return jnp.concatenate(
                [a, jnp.full(pad_shape, fill, a.dtype)], axis=0
            )

        from gpumd_tpu.elements import MASS_TABLE

        mass_new = MASS_TABLE.get(self.type_names[dep["type"]], 1.0)
        self.state = st._replace(
            position=pad(st.position),
            velocity=pad(st.velocity),
            force=pad(st.force),
            mass=pad(st.mass, mass_new),
            type=pad(st.type.astype(jnp.int32), dep["type"]),
            potential_energy=pad(st.potential_energy),
            virial=pad(st.virial),
            heat_current=pad(st.heat_current),
            mask=pad(st.mask, 0.0),
            unwrapped_position=pad(st.unwrapped_position),
        )
        self.symbols = list(self.symbols) + (
            [self.type_names[dep["type"]]] * need
        )
        lab = np.asarray(self.groups.labels)
        if lab.shape[1]:
            self.groups.labels = np.pad(
                lab, ((0, need), (0, 0)), constant_values=-1
            )
        self._n = new_n
        self.ff = ForceField.create(
            self.potentials, self.box, new_n,
            mn=_auto_mn(self.potentials, new_n, self.box), skin=1.0,
        )
        dep["next_slot"] = old_n

        def process(session, state, step):
            s0 = dep["next_slot"]
            k = dep["number"]
            if s0 is None or s0 + k > session._n:
                return
            rng = dep["rng"]
            h = np.asarray(state.box.h)
            pos = np.array(state.position)
            velarr = np.array(state.velocity)
            mask = np.array(state.mask)
            for m in range(k):
                p = np.array([rng.random() * h[0, 0],
                              rng.random() * h[1, 1],
                              rng.random() * h[2, 2]])
                p[dep["direction"]] = (
                    dep["hmin"] + rng.random() * (dep["hmax"] - dep["hmin"])
                )
                pos[s0 + m] = p
                v = np.zeros(3)
                v[dep["direction"]] = dep["velocity"]
                velarr[s0 + m] = v
                mask[s0 + m] = 1.0
            dep["next_slot"] = s0 + k
            session.state = state._replace(
                position=jnp.asarray(pos),
                velocity=jnp.asarray(velarr),
                mask=jnp.asarray(mask),
            )

        self.properties.append(PropertyRequest(dep["interval"], process))

    def kw_change_box(self, args):
        """change_box dxx | dxx dyy dzz | dxx dyy dzz eyz exz exy
        (ref: run.cu:712-810): diagonal entries are length CHANGES in A,
        off-diagonals are strains; positions deform affinely with the box."""
        d = np.zeros((3, 3))
        d[0, 0] = float(args[0])
        if len(args) >= 3:
            d[1, 1], d[2, 2] = float(args[1]), float(args[2])
        else:
            d[1, 1] = d[2, 2] = d[0, 0]
        if len(args) == 6:
            d[1, 2] = d[2, 1] = float(args[3])
            d[0, 2] = d[2, 0] = float(args[4])
            d[0, 1] = d[1, 0] = float(args[5])
        h = np.asarray(self.state.box.h)
        for k in range(3):
            d[k, k] = (h[k, k] + d[k, k]) / h[k, k]
        h_new = d @ h
        from gpumd_tpu.model.box import Box

        new_box = Box.from_lattice(
            h_new.T, pbc=np.asarray(self.box.pbc) > 0
        )
        dm = jnp.asarray(d, self.state.position.dtype)
        pos = self.state.position @ dm.T
        unw = (self.state.unwrapped_position @ dm.T
               if self.state.unwrapped_position is not None else None)
        self.state = self.state._replace(
            position=pos, box=new_box, unwrapped_position=unw
        )
        self.box = new_box
        self.log(f"change_box {args}")

    def kw_add_spring(self, args):
        """add_spring ghost_com <gm> <gid> vx vy vz couple k R0 x0 y0 z0 |
        add_spring ghost_com <gm> <gid> vx vy vz decouple kx ky kz x0 y0 z0
        (ref: add_spring.cu)."""
        from gpumd_tpu.integrate.drivers import AddSpring

        if args[0] != "ghost_com":
            raise ValueError(
                f"add_spring mode {args[0]!r} not supported (ghost_com only)"
            )
        gm, gid = int(args[1]), int(args[2])
        vel = tuple(float(x) for x in args[3:6])
        stiff = args[6]
        gmask = np.asarray(self.groups.mask(gm, gid))
        pos = np.asarray(self.state.position)
        m = np.asarray(self.state.mass) * gmask
        com0 = (m[:, None] * pos).sum(0) / max(m.sum(), 1e-30)
        if stiff == "couple":
            k, r0 = float(args[7]), float(args[8])
            off = tuple(float(x) for x in args[9:12])
            drv = AddSpring(gmask=gmask, com0=tuple(com0), velocity=vel,
                            offset=off, couple=True, k=k, r0=r0)
        elif stiff == "decouple":
            k3 = tuple(float(x) for x in args[7:10])
            off = tuple(float(x) for x in args[10:13])
            drv = AddSpring(gmask=gmask, com0=tuple(com0), velocity=vel,
                            offset=off, couple=False, k3=k3)
        else:
            raise ValueError("add_spring: expected couple|decouple")
        self.drivers.append(drv)
        self.log(f"add_spring {args}")

    def kw_add_random_force(self, args):
        from gpumd_tpu.integrate.drivers import AddRandomForce

        self.drivers.append(AddRandomForce(variance=float(args[0])))
        self.log(f"add_random_force {args}")

    def kw_electron_stop(self, args):
        from gpumd_tpu.integrate.drivers import ElectronStop

        path = args[0]
        if not os.path.isabs(path):
            path = os.path.join(self.workdir, path)
        self.drivers.append(
            ElectronStop.from_file(path, max(1, len(self.type_names)))
        )
        self.log(f"electron_stop {args}")

    def kw_compute_adf(self, args):
        """compute_adf interval bins rc_min rc_max (global) or
        compute_adf interval bins (i j k rcminj rcmaxj rcmink rcmaxk)xM
        (ref: adf.cu:371-460)."""
        from gpumd_tpu.measure.properties import ADF

        if len(args) == 4:
            prop = ADF(int(args[0]), int(args[1]),
                       rc_min=float(args[2]), rc_max=float(args[3]))
        elif len(args) > 4 and (len(args) - 2) % 7 == 0:
            triples = []
            rest = args[2:]
            for m in range(len(rest) // 7):
                t = rest[7 * m : 7 * m + 7]
                triples.append(
                    (int(t[0]), int(t[1]), int(t[2]), float(t[3]),
                     float(t[4]), float(t[5]), float(t[6]))
                )
            prop = ADF(int(args[0]), int(args[1]), triples=triples)
        else:
            raise ValueError(
                "compute_adf needs 4 parameters or 2 + 7*Ntriples"
            )
        self.measure_props.append(prop)
        self.log(f"compute_adf {args}")

    def kw_compute_orientorder(self, args):
        """compute_orientorder <interval> cutoff rc|nnn n <ndeg> l...
        [average] [wl] [wlhat] (ref: orientorder.cu:795-860)."""
        from gpumd_tpu.measure.properties import OrientOrder

        interval = int(args[0])
        mode = args[1]
        if mode not in ("cutoff", "nnn"):
            raise ValueError("compute_orientorder mode must be cutoff or nnn")
        mode_param = float(args[2]) if mode == "cutoff" else int(args[2])
        ndeg = int(args[3])
        degrees = [int(x) for x in args[4 : 4 + ndeg]]
        flags = [int(x) for x in args[4 + ndeg :]]
        average = bool(flags[0]) if len(flags) > 0 else False
        wl = bool(flags[1]) if len(flags) > 1 else False
        wlhat = bool(flags[2]) if len(flags) > 2 else False
        self.measure_props.append(
            OrientOrder(interval, mode, mode_param, degrees,
                        average=average, wl=wl, wlhat=wlhat)
        )
        self.log(f"compute_orientorder {args}")

    def kw_compute_rdf(self, args):
        from gpumd_tpu.measure.properties import RDF

        self.measure_props.append(
            RDF(
                float(args[0]), int(args[1]), int(args[2]),
                num_types=max(1, len(self.type_names)),
                type_names=self.type_names,
            )
        )

    def kw_compute_angular_rdf(self, args):
        """compute_angular_rdf r_cut r_bins theta_bins interval
        [atom_a atom_b]... -> angular_rdf.out
        (ref: angular_rdf.cu:440-520 parse)."""
        from gpumd_tpu.measure.properties import AngularRDF

        pairs = [
            (int(args[i]), int(args[i + 1]))
            for i in range(4, len(args), 2)
        ]
        self.measure_props.append(
            AngularRDF(float(args[0]), int(args[1]), int(args[2]),
                       int(args[3]), pairs)
        )

    # ----------------------------------------------------------------- driver

    KEYWORDS = {
        "potential": kw_potential,
        "velocity": kw_velocity,
        "time_step": kw_time_step,
        "ensemble": kw_ensemble,
        "dump_thermo": kw_dump_thermo,
        "dump_exyz": kw_dump_exyz,
        "dump_position": kw_dump_position,
        "dump_xyz": kw_dump_xyz,
        "dump_restart": kw_dump_restart,
        "dump_velocity": kw_dump_velocity,
        "dump_netcdf": kw_dump_netcdf,
        "plumed": kw_plumed,
        "engine": kw_engine,
        "dump_force": kw_dump_force,
        "compute_cohesive": kw_compute_cohesive,
        "compute_elastic": kw_compute_elastic,
        "correct_velocity": kw_correct_velocity,
        "fix": kw_fix,
        "compute": kw_compute,
        "compute_chunk": kw_compute_chunk,
        "minimize": kw_minimize,
        "replicate": kw_replicate,
        "compute_phonon": kw_compute_phonon,
        "compute_hac": kw_compute_hac,
        "compute_hnemd": kw_compute_hnemd,
        "compute_gkma": kw_compute_gkma,
        "compute_extrapolation": kw_compute_extrapolation,
        "dump_shock_nemd": kw_dump_shock_nemd,
        "dump_beads": kw_dump_beads,
        "dump_cg": kw_dump_cg,
        "compute_ic": kw_compute_ic,
        "compute_lsqt": kw_compute_lsqt,
        "compute_dpdt": kw_compute_dpdt,
        "compute_es": kw_compute_es,
        "compute_hnema": kw_compute_hnema,
        "compute_hnemdec": kw_compute_hnemdec,
        "compute_msd": kw_compute_msd,
        "compute_sdc": kw_compute_sdc,
        "compute_dos": kw_compute_dos,
        "add_force": kw_add_force,
        "add_spring": kw_add_spring,
        "change_box": kw_change_box,
        "deposit": kw_deposit,
        "add_efield": kw_add_efield,
        "add_random_force": kw_add_random_force,
        "electron_stop": kw_electron_stop,
        "compute_adf": kw_compute_adf,
        "compute_orientorder": kw_compute_orientorder,
        "compute_rdf": kw_compute_rdf,
        "compute_angular_rdf": kw_compute_angular_rdf,
        "compute_shc": kw_compute_shc,
        "compute_viscosity": kw_compute_viscosity,
        "dump_observer": kw_dump_observer,
        "dump_dipole": kw_dump_dipole,
        "dump_polarizability": kw_dump_polarizability,
        "active": kw_active,
        "mc": kw_mc,
        "kspace": kw_kspace,
        "dftd3": kw_dftd3,
        "move": kw_move,
        "deform": kw_deform,
        "run": kw_run,
    }

    def execute(self, runfile: str = "run.in"):
        for toks in parse_run_in(os.path.join(self.workdir, runfile)):
            kw, args = toks[0], toks[1:]
            handler = self.KEYWORDS.get(kw)
            if handler is None:
                raise ValueError(f"unknown or unsupported run.in keyword {kw!r}")
            handler(self, args)
        for f in self._files.values():
            f.close()
        self._files.clear()


def _auto_mn(potentials, n_atoms=None, box=None) -> int:
    """Neighbor capacity: NEP files carry MN hints; otherwise default.
    Long-cutoff terms (DFTD3 rc 15 A, ILP rc_global 16 A) get a
    density-based bound so the list cannot silently truncate."""
    mn = 0
    rc_max = max((getattr(p, "rc", 0.0) for p in potentials), default=0.0)
    rc_base = 0.0
    for p in potentials:
        if hasattr(p, "model"):
            mn = max(mn, p.model.mn_radial)
            rc_base = max(rc_base, p.rc)
    if mn and rc_base and rc_max > rc_base:
        mn = int(mn * (rc_max / rc_base) ** 3)
    out = int(mn * 1.3) if mn else 256
    if n_atoms and box is not None and rc_max > 0.0:
        import math

        dens = n_atoms / float(np.asarray(box.volume))
        bound = dens * 4.0 / 3.0 * math.pi * (rc_max + 1.5) ** 3
        # images of a small periodic cell can exceed n_atoms, so no
        # clamp by atom count here
        out = max(out, int(bound * 1.5) + 8)
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    workdir = argv[0] if argv else "."
    Session(workdir).execute()


if __name__ == "__main__":
    main()
