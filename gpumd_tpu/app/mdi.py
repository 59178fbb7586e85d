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


if __name__ == "__main__":
    import sys

    serve(sys.argv[1] if len(sys.argv) > 1 else ".")
