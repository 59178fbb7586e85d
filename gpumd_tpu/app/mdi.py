"""MDI engine mode: drive the MD engine from an external program.

TPU-native analog of the reference's MDI server (ref: src/main_mdi/
run.cu:355-480, main.cu:42-51): an external driver (e.g. an ab-initio
loop) sets positions/cell and reads forces/energy/stress, optionally
stepping the dynamics one step at a time.  The reference links libmdi;
here the same engine surface is exposed two ways:

  * `MDIEngine` — an in-process Python object with the MDI command set as
    methods (set_coords / get_forces / get_energy / get_stress /
    init_md / step).  This is the natural JAX-era integration point
    (ASE-style calculators, active-learning loops).
  * `serve()` — a minimal newline/JSON TCP server speaking the same
    commands for out-of-process drivers ("<FORCES", ">COORDS", ...),
    covering the reference's command vocabulary without the libmdi
    dependency.

Units follow MDI conventions at the wire (atomic units: Bohr, Hartree),
converted at the boundary like the reference does.
"""

from __future__ import annotations

import json
import os
import socket
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

BOHR = 0.529177210903  # A
HARTREE = 27.211386245988  # eV


class MDIEngine:
    """In-process engine: wraps a Session prepared from model.xyz+run.in
    (the run.in should configure potential/ensemble but needs no `run`)."""

    def __init__(self, workdir: str = "."):
        from gpumd_tpu.app.gpumd import Session

        self.session = Session(workdir, quiet=True)
        self.session.execute()  # executes setup keywords (no run needed)
        self._fresh = True
        self._compute = jax.jit(self.session.ff.compute)
        self._state_out = None

    # ---- MDI command surface (ref: run.cu:355-480) -----------------------

    def get_natoms(self) -> int:
        return int(np.asarray(self.session.state.mask).sum())

    def set_coords(self, coords_bohr):
        """>COORDS: (N, 3) in Bohr."""
        pos = jnp.asarray(np.asarray(coords_bohr) * BOHR)
        n = pos.shape[0]
        st = self.session.state
        self.session.state = st._replace(
            position=st.position.at[:n].set(pos)
        )
        self._state_out = None

    def set_cell(self, cell_bohr):
        """>CELL: 3x3 in Bohr (column vectors a, b, c)."""
        from gpumd_tpu.model.box import Box

        h = np.asarray(cell_bohr) * BOHR
        box = Box.from_lattice(
            h.T, pbc=np.asarray(self.session.box.pbc) > 0
        )
        self.session.box = box
        self.session.state = self.session.state._replace(box=box)
        self._state_out = None

    def _ensure(self):
        if self._state_out is None:
            self._state_out = self._compute(self.session.state)
        return self._state_out

    def get_energy(self) -> float:
        """<ENERGY in Hartree."""
        out = self._ensure()
        e = float(jnp.sum(out.potential_energy * out.mask))
        return e / HARTREE

    def get_forces(self):
        """<FORCES in Hartree/Bohr, (N, 3)."""
        out = self._ensure()
        n = self.get_natoms()
        f = np.asarray(out.force)[:n]
        return f * (BOHR / HARTREE)

    def get_stress(self):
        """<STRESS: virial/volume in Hartree/Bohr^3, (3, 3)."""
        out = self._ensure()
        w = np.asarray(
            jnp.sum(out.virial * out.mask[:, None, None], axis=0)
        )
        vol = float(np.asarray(self.session.state.box.volume))
        s = w / vol  # eV / A^3
        return s * (BOHR**3 / HARTREE)

    def get_coords(self):
        """<COORDS in Bohr."""
        n = self.get_natoms()
        return np.asarray(self.session.state.position)[:n] / BOHR

    def init_md(self):
        """@INIT_MD: build the integrator for step-one control."""
        from gpumd_tpu.integrate.ensembles.nve import NVE
        from gpumd_tpu.integrate.run import make_md_step

        ens = self.session.ensemble or NVE()
        self._ens = ens
        self._step = jax.jit(
            make_md_step(self.session.ff, ens, self.session.dt,
                         observer=lambda s: 0)
        )
        st = self._compute(self.session.state)
        self._aux = ens.init(st)
        self._cache = jax.jit(self.session.ff.refresh_cache)(st)
        self.session.state = st
        self._fresh = False

    def step(self, n: int = 1):
        """@COORDS advance: n MD steps."""
        if self._fresh:
            self.init_md()
        st = self.session.state
        for _ in range(n):
            (st, self._aux, self._cache), _ = self._step(
                (st, self._aux, self._cache), None
            )
        self.session.state = st
        self._state_out = None

    def step_with_forces(self, forces_ev_a):
        """>FORCES path: integrate ONE velocity-Verlet step using
        externally supplied forces (QM/MM hybrid loops — ref:
        run.cu mdi_set_forces + mdi_step_one)."""
        if self._fresh:
            self.init_md()
        st = self.session.state
        n = forces_ev_a.shape[0]
        st = st._replace(force=st.force.at[:n].set(jnp.asarray(forces_ev_a)))
        dt = self.session.dt
        inv_m = (st.mask / st.mass)[:, None]
        v_half = st.velocity + 0.5 * dt * st.force * inv_m
        x_new = st.position + dt * v_half * st.mask[:, None]
        # second half-kick reuses the external forces (the next >FORCES
        # call supplies updated ones, as in the reference's hybrid loop)
        v_new = v_half + 0.5 * dt * st.force * inv_m
        self.session.state = st._replace(position=x_new, velocity=v_new)
        self._state_out = None


def serve(workdir: str = ".", host: str = "127.0.0.1", port: int = 8021):
    """Line-protocol TCP server: one JSON object per line,
    {"cmd": "<FORCES"} etc.; arrays as nested lists."""
    eng = MDIEngine(workdir)
    srv = socket.create_server((host, port))
    print(f"MDI engine listening on {host}:{port}")
    conn, _ = srv.accept()
    f = conn.makefile("rw")
    for line in f:
        try:
            msg = json.loads(line)
            cmd = msg.get("cmd", "")
            if cmd == "<NATOMS":
                out = {"value": eng.get_natoms()}
            elif cmd == "<ENERGY":
                out = {"value": eng.get_energy()}
            elif cmd == "<FORCES":
                out = {"value": eng.get_forces().tolist()}
            elif cmd == "<STRESS":
                out = {"value": eng.get_stress().tolist()}
            elif cmd == "<COORDS":
                out = {"value": eng.get_coords().tolist()}
            elif cmd == ">COORDS":
                eng.set_coords(np.asarray(msg["value"]))
                out = {"ok": True}
            elif cmd == ">CELL":
                eng.set_cell(np.asarray(msg["value"]))
                out = {"ok": True}
            elif cmd == "@INIT_MD":
                eng.init_md()
                out = {"ok": True}
            elif cmd == "@COORDS":
                eng.step(int(msg.get("n", 1)))
                out = {"ok": True}
            elif cmd == "EXIT":
                f.write(json.dumps({"ok": True}) + "\n")
                f.flush()
                break
            else:
                out = {"error": f"unknown command {cmd!r}"}
        except Exception as e:  # robust server loop
            out = {"error": str(e)}
        f.write(json.dumps(out) + "\n")
        f.flush()
    conn.close()
    srv.close()


def serve_libmdi(workdir: str = ".", mdi_options: str = "",
                 lib_path: Optional[str] = None, max_commands: int = 0):
    """Genuine MDI engine loop over the MolSSI MDI library via ctypes.

    Mirrors the reference's mdi_engine_main command loop exactly
    (ref: src/main_mdi/mdi_stub.cu:49-246): <NATOMS, >COORDS, <COORDS,
    >FORCES (integrates one step with external forces), <FORCES, <ENERGY,
    >ENERGY, >STRESS, EXIT.  The MDI wire protocol itself is the
    library's — datatype codes and MDI_COMMAND_LENGTH are read from the
    loaded .so, so any libmdi ABI works.  Library discovery: `lib_path`
    arg, then $MDI_LIBRARY, then ctypes.util.find_library("mdi").
    Without a library this raises; `serve()` (JSON line protocol) is the
    dependency-free fallback, matching the reference's own behavior when
    built without USE_MDI.
    """
    import ctypes
    import ctypes.util

    path = lib_path or os.environ.get("MDI_LIBRARY") or ctypes.util.find_library("mdi")
    if not path:
        raise RuntimeError(
            "serve_libmdi: no MDI library found (set MDI_LIBRARY); "
            "use gpumd_tpu.app.mdi.serve() for the JSON fallback"
        )
    lib = ctypes.CDLL(path)

    def const(name, default):
        try:
            return int(ctypes.c_int.in_dll(lib, name).value)
        except ValueError:
            return default

    CMD_LEN = const("MDI_COMMAND_LENGTH_", const("MDI_COMMAND_LENGTH", 12))
    MDI_INT = const("MDI_INT_", const("MDI_INT", 0))
    MDI_DOUBLE = const("MDI_DOUBLE_", const("MDI_DOUBLE", 1))

    # MDI_Init: modern builds take an options string; older take argc/argv.
    opts = f"-role ENGINE -name gpumd_tpu {mdi_options}".strip().encode()
    try:
        lib.MDI_Init.argtypes = [ctypes.c_char_p]
        ret = lib.MDI_Init(opts)
    except (ctypes.ArgumentError, OSError):
        ret = 1
    if ret != 0:
        argv_strings = [b"gpumd_tpu"] + opts.split()
        argc = ctypes.c_int(len(argv_strings))
        argv_arr = (ctypes.c_char_p * len(argv_strings))(*argv_strings)
        argv_p = ctypes.cast(
            ctypes.pointer(argv_arr),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_char_p)),
        )
        lib.MDI_Init.argtypes = []
        ret = lib.MDI_Init(ctypes.byref(argc), argv_p)
        if ret != 0:
            raise RuntimeError(f"MDI_Init failed ({ret})")

    for cmd in (b"<NATOMS", b">COORDS", b"<COORDS", b">FORCES", b"<FORCES",
                b"<ENERGY", b">ENERGY", b">STRESS", b"EXIT"):
        try:
            lib.MDI_Register_node(b"@DEFAULT")
            lib.MDI_Register_command(b"@DEFAULT", cmd)
        except AttributeError:
            break

    eng = MDIEngine(workdir)
    comm = ctypes.c_int(0)
    if lib.MDI_Accept_communicator(ctypes.byref(comm)) != 0:
        raise RuntimeError("MDI_Accept_communicator failed")

    n = eng.get_natoms()
    buf = ctypes.create_string_buffer(CMD_LEN + 1)
    served = 0
    while True:
        if lib.MDI_Recv_command(buf, comm) != 0:
            break
        cmd = buf.value.decode(errors="replace")
        served += 1
        if cmd == "<NATOMS":
            v = ctypes.c_int(n)
            lib.MDI_Send(ctypes.byref(v), 1, MDI_INT, comm)
        elif cmd == ">COORDS":
            arr = (ctypes.c_double * (3 * n))()
            lib.MDI_Recv(arr, 3 * n, MDI_DOUBLE, comm)
            eng.set_coords(np.frombuffer(arr, np.float64).reshape(n, 3))
        elif cmd == "<COORDS":
            c = np.ascontiguousarray(eng.get_coords(), np.float64)
            lib.MDI_Send(c.ctypes.data_as(ctypes.c_void_p), 3 * n,
                         MDI_DOUBLE, comm)
        elif cmd == "<FORCES":
            f = np.ascontiguousarray(eng.get_forces(), np.float64)
            lib.MDI_Send(f.ctypes.data_as(ctypes.c_void_p), 3 * n,
                         MDI_DOUBLE, comm)
        elif cmd == ">FORCES":
            arr = (ctypes.c_double * (3 * n))()
            lib.MDI_Recv(arr, 3 * n, MDI_DOUBLE, comm)
            ext_f = np.frombuffer(arr, np.float64).reshape(n, 3)
            eng.step_with_forces(ext_f * (HARTREE / BOHR))
        elif cmd == "<ENERGY":
            v = ctypes.c_double(eng.get_energy())
            lib.MDI_Send(ctypes.byref(v), 1, MDI_DOUBLE, comm)
        elif cmd == ">ENERGY":
            v = ctypes.c_double(0.0)
            lib.MDI_Recv(ctypes.byref(v), 1, MDI_DOUBLE, comm)
            eng.external_energy = float(v.value) * HARTREE
        elif cmd == ">STRESS":
            arr = (ctypes.c_double * 9)()
            lib.MDI_Recv(arr, 9, MDI_DOUBLE, comm)
            eng.external_stress = np.frombuffer(arr, np.float64).reshape(3, 3)
        elif cmd == "EXIT":
            break
        if max_commands and served >= max_commands:
            break
    return served


if __name__ == "__main__":
    import sys

    if "--libmdi" in sys.argv:
        i = sys.argv.index("--libmdi")
        serve_libmdi(
            sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] != "--libmdi"
            else ".",
            mdi_options=" ".join(sys.argv[i + 1:]),
        )
    else:
        serve(sys.argv[1] if len(sys.argv) > 1 else ".")
