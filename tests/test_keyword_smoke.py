"""Tier-1 command-IO smoke matrix (model: tests_pytest/test_io_dump_commands.py
and test_io_compute_commands.py of the reference): every dump_*/compute_*
keyword runs on a tiny LJ argon system and produces a parseable output of
the expected shape.  Physics correctness is covered by the targeted tests;
this file guards the keyword surface itself."""

import os

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, read_xyz_frames, write_xyz


def _setup(tmp_path, groups=False):
    a0, nc = 5.26, 3
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
    cells = np.array([[i, j, k] for i in range(nc)
                      for j in range(nc) for k in range(nc)])
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    g = (pos[:, 2] > 1.5 * a0).astype(int)[:, None] if groups else None
    write_xyz(
        str(tmp_path / "model.xyz"),
        XYZFrame(symbols=["Ar"] * n, positions=pos,
                 lattice=np.diag([nc * a0] * 3), pbc=(True, True, True),
                 groups=g),
        with_groups=groups,
    )
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    return n


def _run(tmp_path, extra, steps=8, ensemble="nve"):
    (tmp_path / "run.in").write_text(
        f"potential lj.txt\nvelocity 40\ntime_step 4\n"
        f"ensemble {ensemble}\n{extra}\nrun {steps}\n"
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    return s


CASES = [
    # (run.in line, output file, check)
    ("dump_thermo 2", "thermo.out",
     lambda p, n: np.loadtxt(p).reshape(-1, 18)),
    ("dump_position 2", "movie.xyz",
     lambda p, n: read_xyz_frames(str(p))),
    ("dump_restart 4", "restart.xyz",
     lambda p, n: read_xyz_frames(str(p), max_frames=1)),
    ("dump_velocity 2", "velocity.out",
     lambda p, n: np.loadtxt(p).reshape(-1, 3)),
    ("dump_force 2", "force.out",
     lambda p, n: np.loadtxt(p).reshape(-1, 3)),
    ("dump_exyz 2 1 1", "dump.xyz",
     lambda p, n: read_xyz_frames(str(p))),
    ("dump_xyz -1 0 2 smoke.xyz", "smoke.xyz",
     lambda p, n: read_xyz_frames(str(p))),
    ("compute_rdf 8.0 50 4", "rdf.out", lambda p, n: open(p).read()),
    ("compute_msd 2 2", "msd.out", lambda p, n: np.loadtxt(p)),
    ("compute_sdc 2 2", "sdc.out", lambda p, n: np.loadtxt(p)),
    ("compute_dos 2 2 400", "dos.out", lambda p, n: np.loadtxt(p)),
    ("compute_hac 2 2 2", "hac.out", lambda p, n: np.loadtxt(p)),
    ("compute_viscosity 2 4", "viscosity.out", lambda p, n: np.loadtxt(p)),
    ("compute_adf 4 30 2.0 4.5", "adf.out", lambda p, n: np.loadtxt(p)),
    ("compute_angular_rdf 6.0 30 24 4", "angular_rdf.out",
     lambda p, n: open(p).read()),
    ("compute_orientorder 4 cutoff 4.0 2 4 6", "orientorder.out",
     lambda p, n: open(p).read()),
]


@pytest.mark.parametrize("line,outfile,check",
                         CASES, ids=[c[0].split()[0] for c in CASES])
def test_keyword_io(tmp_path, line, outfile, check):
    n = _setup(tmp_path)
    _run(tmp_path, line)
    out = tmp_path / outfile
    assert out.exists(), f"{outfile} not written"
    check(out, n)
