"""ti_spring nonequilibrium free-energy switching
(ref: src/integrate/ensemble_ti_spring.cu)."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def _write_argon(tmp_path, nc=3):
    a0 = 5.26
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True, True, True),
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text("lj 1 Ar\n1.032e-2 3.405 9.0\n")
    return n


def test_ti_spring_explicit_k(tmp_path):
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ti_spring temp 20 tperiod 100 tswitch 400 tequil 100 spring Ar 0.5
run 1400
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    yaml = dict(
        line.split(": ")
        for line in (tmp_path / "ti_spring.yaml").read_text().splitlines()
    )
    f = float(yaml["F"])
    assert np.isfinite(f)
    # LJ argon at 20 K: F/atom = U_lattice (-0.086) + harmonic vibrational
    # free energy (~ +0.008); measured -0.0777 eV/atom
    assert -0.09 < f < -0.065, f
    csv = np.genfromtxt(tmp_path / "ti_spring.csv", delimiter=",",
                        skip_header=1)
    assert csv.shape[1] == 4
    # both switching legs recorded
    assert (csv[:, 0] >= 0).all() and csv[:, 0].max() > 0.99


def test_ti_spring_auto_k(tmp_path):
    """Auto spring constants from MSD give a similar free energy."""
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ti_spring temp 20 tperiod 100 tswitch 400 tequil 200
run 1600
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    yaml = dict(
        line.split(": ")
        for line in (tmp_path / "ti_spring.yaml").read_text().splitlines()
    )
    f = float(yaml["F"])
    assert np.isfinite(f)
    assert -0.09 < f < -0.065, f


def test_ti_fixed_lambda(tmp_path):
    """Fixed-lambda TI (ref: ensemble_ti.cu): mixed Hamiltonian runs and
    logs per-step (pe/N, espring/N) rows."""
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ti lambda 0.5 temp 20 tperiod 100 spring Ar 0.5
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    csv = np.genfromtxt(tmp_path / "ti.csv", delimiter=",", skip_header=1)
    assert csv.shape == (200, 2)
    assert np.isfinite(csv).all()
    assert (csv[:, 0] < 0).all()  # cohesive pe
    assert (csv[:, 1] >= 0).all()  # spring energy
    # spring energy should be small at lambda=0.5, T=20K (bound atoms)
    assert csv[-1, 1] < 0.05


def test_ti_rs_lambda_ramp(tmp_path):
    """Reversible scaling: lambda ramps 1 -> T/Tmax and back; csv rows
    (lambda, dlambda, enthalpy/N) recorded in both legs
    (ref: ensemble_ti_rs.cu)."""
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ti_rs temp 20 40 iso 0 tperiod 100 pperiod 1000 tswitch 80 tequil 20
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    csv = np.genfromtxt(tmp_path / "ti_rs.csv", delimiter=",", skip_header=1)
    assert csv.shape[1] == 3
    lam = csv[:, 0]
    assert lam.max() > 0.98  # starts at 1
    assert abs(lam.min() - 0.5) < 0.02  # lambda_f = 20/40
    assert np.isfinite(csv[:, 2]).all()
    # both legs: dlambda changes sign
    assert (csv[:, 1] < 0).any() and (csv[:, 1] > 0).any()


def test_ti_as_pressure_ramp(tmp_path):
    """Adiabatic switching: target pressure ramps p_min -> p_max and back;
    V/N shrinks under load (ref: ensemble_ti_as.cu)."""
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 20
time_step 5
ensemble ti_as temp 20 press 0 0.2 tperiod 100 pperiod 500 tswitch 80 tequil 20
run 260
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    csv = np.genfromtxt(tmp_path / "ti_as.csv", delimiter=",", skip_header=1)
    assert csv.shape[1] == 2
    p = csv[:, 0]
    assert abs(p.max() - 0.2) < 1e-6 and abs(p.min()) < 1e-6
    v = csv[:, 1]
    assert np.isfinite(v).all()
    # volume at max pressure below volume at zero pressure
    assert v[np.argmax(p)] < v[0]


def test_ti_liquid_uf_force_consistency():
    """UF forces must equal -grad of the summed UF energy."""
    import jax
    import jax.numpy as jnp

    from gpumd_tpu.integrate.ensembles.ti import TILiquid
    from gpumd_tpu.model import Box, make_state

    rng = np.random.default_rng(0)
    n = 24
    box = Box.orthogonal([8.0, 8.0, 8.0])
    pos = rng.uniform(0, 8.0, (n, 3))
    state = make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    ens = TILiquid(temperature=100.0, sigma_sqrd=2.0, p_uf=50.0)

    e_uf, f_uf = ens._uf_pair(state)

    def total_e(x):
        return jnp.sum(ens._uf_pair(state._replace(position=x))[0])

    g = jax.grad(total_e)(state.position)
    np.testing.assert_allclose(
        np.asarray(f_uf), -np.asarray(g), rtol=1e-6, atol=1e-8
    )
    assert float(e_uf.sum()) > 0.0  # purely repulsive model


def test_ti_liquid_run(tmp_path):
    n = _write_argon(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 90
time_step 5
ensemble ti_liquid temp 90 tperiod 100 tswitch 300 tequil 100 sigmasqrd 2.0 p 25 press 0
run 1100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    yaml = dict(
        line.split(": ")
        for line in (tmp_path / "ti_liquid.yaml").read_text().splitlines()
    )
    f = float(yaml["F"])
    e_ref = float(yaml["E_UFmodel"])
    assert np.isfinite(f) and np.isfinite(e_ref)
    # argon near melt: absolute F/atom must land near the lattice energy
    # scale (between -0.2 and 0 eV/atom), far from garbage
    assert -0.2 < f < 0.0, f
    csv = np.genfromtxt(tmp_path / "ti_liquid.csv", delimiter=",",
                        skip_header=1)
    assert csv.shape[1] == 4
    assert (csv[:, 0] >= 0).all() and csv[:, 0].max() > 0.99
    # UF energy column is positive (repulsive reference fluid)
    assert csv[:, 3].max() > 0.0
