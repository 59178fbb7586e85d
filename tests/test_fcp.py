"""FCP force-constant potential (ref: src/force/fcp.cu)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _write_fcp_fixture(tmp_path, k_spring=1.0, order=2):
    """Simple cubic lattice with nearest-neighbor harmonic springs written
    in the reference's fcs/clusters file format."""
    a0 = 3.0
    nc = 3
    grid = np.stack(
        np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    r0 = grid * a0
    n = len(r0)
    lat = np.diag([nc * a0] * 3)

    frame = XYZFrame(
        symbols=["Ar"] * n, positions=r0.astype(float), lattice=lat,
        pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)

    fdir = tmp_path / "fcs"
    fdir.mkdir()
    np.savetxt(fdir / "r0.in", r0, fmt="%.8f")

    # neighbor pairs (periodic nearest neighbors along each axis)
    def idx(c):
        return int((c[0] % nc) * nc * nc + (c[1] % nc) * nc + (c[2] % nc))

    pairs = []
    for c in grid:
        for d in range(3):
            for s in (-1, 1):
                c2 = c.copy()
                c2[d] += s
                pairs.append((idx(c), idx(c2)))
    # phi rows: 0 = diagonal 2k per bond count? Use standard FC:
    # phi(i,i) = 6k I (6 neighbors), phi(i,j) = -k I per bond
    phi = np.zeros((2, 3, 3))
    phi[0] = 6 * k_spring * np.eye(3)
    phi[1] = -k_spring * np.eye(3)
    with open(fdir / "fcs_order2.in", "w") as f:
        f.write("2\n")
        for m in range(2):
            for a in range(3):
                for b in range(3):
                    f.write(f"{a} {b} {phi[m, a, b]:.8f}\n")
    with open(fdir / "clusters_order2.in", "w") as f:
        rows = [(i, i, 0) for i in range(n)] + [(i, j, 1) for i, j in pairs]
        f.write(f"{len(rows)}\n")
        for r in rows:
            f.write(f"{r[0]} {r[1]} {r[2]}\n")

    (tmp_path / "fcp.txt").write_text("fcp 1 Ar\n2 2\nfcs\n")
    return n, a0, k_spring


def test_fcp_forces_match_analytic(tmp_path):
    """Displacing one atom: f = -6k u on it, +k u on each neighbor."""
    from gpumd_tpu.app.gpumd import Session

    n, a0, k = _write_fcp_fixture(tmp_path)
    (tmp_path / "run.in").write_text("potential fcp.txt\ntime_step 1\n")
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    import jax

    d = 0.1
    state = s.state._replace(
        position=s.state.position.at[0, 0].add(d)
    )
    out = jax.jit(s.ff.compute)(state)
    f = np.asarray(out.force)[:n]
    # atom 0: f_x = -6 k d (self term);  k d from each x-neighbor's phi(0,j)?
    # E = 1/2 sum phi u u with u only on atom 0: E = 3 k d^2, f0 = -6 k d
    assert np.isclose(f[0, 0], -6 * k * d + 2 * 0, atol=1e-5), f[0]
    e = float(np.sum(np.asarray(out.potential_energy)[:n]))
    assert np.isclose(e, 3 * k * d * d, atol=1e-8)
    # zero net force (explicit zero-sum)
    assert np.allclose(f.sum(axis=0), 0.0, atol=1e-5)


def test_fcp_nve_conserves(tmp_path):
    """Harmonic crystal NVE: energy conserved tightly."""
    from gpumd_tpu.app.gpumd import Session

    n, a0, k = _write_fcp_fixture(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential fcp.txt
velocity 20
time_step 1
ensemble nve
dump_thermo 10
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    th = np.loadtxt(tmp_path / "thermo.out")
    etot = th[:, 1] + th[:, 2]  # T-column? kinetic + potential columns
    # thermo.out columns: T K U ...
    ke = th[:, 1]
    pe = th[:, 2]
    etot = ke + pe
    drift = abs(etot[-1] - etot[0])
    assert drift < 1e-4 * n, (etot[0], etot[-1])
