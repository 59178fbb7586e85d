"""DFT-D3 (BJ) dispersion (ref: src/force/dftd3.cu + dftd3para.cuh)."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpumd_tpu.model.box import Box
from gpumd_tpu.neighbor.neighbor import neighbor_brute
from gpumd_tpu.potentials.dftd3 import DFTD3

from conftest import requires_reference


@requires_reference
def test_npz_matches_reference_table():
    """The shipped npz asset reproduces the reference parameter header."""
    src = open("/root/reference/src/force/dftd3para.cuh").read()

    def grab(name):
        m = re.search(rf"{name}\[[^\]]*\]\s*=\s*\{{(.*?)\}};", src, re.S)
        return np.asarray(
            [float(x) for x in re.findall(
                r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", m.group(1).replace("f", "")
            )]
        )

    import os

    tab = np.load(
        os.path.join(os.path.dirname(__file__), "..", "gpumd_tpu", "assets",
                     "dftd3para.npz")
    )
    assert np.allclose(tab["r2r4"], grab("r2r4"))
    assert np.allclose(tab["covalent_radius"], grab("covalent_radius"))
    assert np.allclose(tab["c6_ref"], grab("c6_ref_cpu"))
    assert np.array_equal(tab["num_cn"], grab("num_cn").astype(int))


def _dimer_energy(d3, r):
    box = Box.orthogonal([60.0, 60.0, 60.0])
    pos = jnp.asarray([[10.0, 10.0, 10.0], [10.0 + r, 10.0, 10.0]])
    types = jnp.zeros(2, jnp.int32)
    mask = jnp.ones(2)
    nbr = neighbor_brute(pos, box, mask, rc=d3.rc_radial, mn=4, reps=(0, 0, 0))
    out = d3.compute(types, nbr, mask)
    return float(jnp.sum(out.energy)), np.asarray(out.force)


def test_carbon_dimer_attraction_and_decay():
    d3 = DFTD3.create("pbe", 15.0, 10.0, ["C"])
    e4, f4 = _dimer_energy(d3, 4.0)
    e8, f8 = _dimer_energy(d3, 8.0)
    e12, _ = _dimer_energy(d3, 12.0)
    assert e4 < e8 < e12 < 0.0  # attractive, decaying
    # doubling r from 6 to 12: below the pure r^-6 factor 64 because the
    # BJ damping radius (~5 A for C) still softens r = 6
    e6, _ = _dimer_energy(d3, 6.0)
    ratio = e6 / e12
    assert 25.0 < ratio < 64.0, ratio
    # forces attract along the bond and are antisymmetric
    assert f4[0, 0] > 0 and np.allclose(f4[0], -f4[1], atol=1e-8)


def test_forces_match_fd():
    d3 = DFTD3.create("pbe", 15.0, 10.0, ["C", "H"])
    rng = np.random.default_rng(0)
    box = Box.orthogonal([14.0, 14.0, 14.0])
    pos = jnp.asarray(rng.random((8, 3)) * 12.0 + 1.0)
    types = jnp.asarray(rng.integers(0, 2, 8), jnp.int32)
    mask = jnp.ones(8)

    def e_of(p):
        nbr = neighbor_brute(p, box, mask, rc=15.0, mn=16, reps=(1, 1, 1))
        out = d3.compute(types, nbr, mask)
        return jnp.sum(out.energy)

    nbr = neighbor_brute(pos, box, mask, rc=15.0, mn=16, reps=(1, 1, 1))
    f = np.asarray(d3.compute(types, nbr, mask).force)
    h = 1e-4
    for i, a in [(0, 0), (3, 1), (5, 2)]:
        ep = float(e_of(pos.at[i, a].add(h)))
        em = float(e_of(pos.at[i, a].add(-h)))
        assert np.isclose(f[i, a], -(ep - em) / (2 * h), rtol=2e-3, atol=1e-7)


def test_app_dftd3_keyword(tmp_path):
    """dftd3 keyword attaches the term; energy drops vs the bare NEP."""
    from gpumd_tpu.app.gpumd import Session
    from gpumd_tpu.io.xyz import XYZFrame, write_xyz

    nep_src = "/root/reference/tests_pytest/fixtures/models/nep_C.txt"
    import os

    if not os.path.exists(nep_src):
        pytest.skip("no reference fixture")
    import shutil

    shutil.copy(nep_src, tmp_path / "nep.txt")
    struct = "/root/reference/tests_pytest/fixtures/structures/C-nat16-rattled.xyz"
    shutil.copy(struct, tmp_path / "model.xyz")

    (tmp_path / "run.in").write_text("potential nep.txt\ntime_step 1\n")
    s0 = Session(str(tmp_path), quiet=True)
    s0.execute()
    out0 = jax.jit(s0.ff.compute)(s0.state)
    e0 = float(jnp.sum(out0.potential_energy * out0.mask))

    (tmp_path / "run.in").write_text(
        "potential nep.txt\ndftd3 pbe 12 6\ntime_step 1\n"
    )
    s1 = Session(str(tmp_path), quiet=True)
    s1.execute()
    out1 = jax.jit(s1.ff.compute)(s1.state)
    e1 = float(jnp.sum(out1.potential_energy * out1.mask))
    assert e1 < e0  # dispersion lowers the energy
    assert e0 - e1 < 5.0  # but only by a correction-scale amount
