"""dump_observer: multi-NEP observation (active-learning disagreement)."""

import os

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, read_xyz_frames, write_xyz

from conftest import requires_reference

MODELS = "/root/reference/tests_pytest/fixtures/models"
STRUCTS = "/root/reference/tests_pytest/fixtures/structures"


@requires_reference
def test_observe_mode_two_potentials(tmp_path):
    import shutil

    from gpumd_tpu.io.xyz import read_xyz

    f = read_xyz(f"{STRUCTS}/BaZrO3-nat40-rattled.xyz")
    write_xyz(str(tmp_path / "model.xyz"), f)
    shutil.copy(f"{MODELS}/nep_BaZrO3.txt", tmp_path / "nep0.txt")
    # second observer: same architecture, perturbed params — emulate an
    # ensemble member by reusing the same file (legal: observe mode just
    # evaluates each potential)
    shutil.copy(f"{MODELS}/nep_BaZrO3.txt", tmp_path / "nep1.txt")
    (tmp_path / "run.in").write_text(
        """potential nep0.txt
potential nep1.txt
velocity 300
time_step 1
ensemble nve
dump_observer observe 10 20 1 1
run 40
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    o0 = np.loadtxt(tmp_path / "observer0.out")
    o1 = np.loadtxt(tmp_path / "observer1.out")
    assert o0.shape == (4, 18) and o1.shape == (4, 18)
    # identical models -> identical observed thermo
    assert np.allclose(o0, o1, rtol=1e-8)
    frames = read_xyz_frames(str(tmp_path / "observer0.xyz"))
    assert len(frames) == 2
    assert frames[0].forces is not None


@requires_reference
def test_active_learning(tmp_path):
    import shutil

    from gpumd_tpu.io.xyz import read_xyz

    f = read_xyz(f"{STRUCTS}/BaZrO3-nat40-rattled.xyz")
    write_xyz(str(tmp_path / "model.xyz"), f)
    shutil.copy(f"{MODELS}/nep_BaZrO3.txt", tmp_path / "nep0.txt")
    shutil.copy(f"{MODELS}/nep_BaZrO3.txt", tmp_path / "nep1.txt")
    (tmp_path / "run.in").write_text(
        """potential nep0.txt
potential nep1.txt
velocity 300
time_step 1
ensemble nve
active 10 0 1 0 0.001
run 30
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    out = np.loadtxt(tmp_path / "active.out")
    assert out.shape == (3, 2)
    # identical potentials -> zero uncertainty -> no dumped frames
    assert np.all(out[:, 1] < 1e-5)
    assert not (tmp_path / "active.xyz").exists()


@requires_reference
@pytest.mark.slow
def test_observe_mode_dense_engine(tmp_path):
    """Round 5: observe-mode multi-NEP decks qualify for the compact fast
    path — potential 0 drives the MD scan, observer models evaluate at
    dump intervals only (ref: dump_observer.cu:29-80).  `engine dense`
    forces the fast path on CPU; results must match the reference-ff
    observer outputs from the list-path test above."""
    import shutil

    from gpumd_tpu.io.xyz import read_xyz

    f = read_xyz(f"{STRUCTS}/BaZrO3-nat40-rattled.xyz")
    write_xyz(str(tmp_path / "model.xyz"), f)
    shutil.copy(f"{MODELS}/nep_BaZrO3.txt", tmp_path / "nep0.txt")
    shutil.copy(f"{MODELS}/nep_BaZrO3.txt", tmp_path / "nep1.txt")
    (tmp_path / "run.in").write_text(
        """potential nep0.txt
potential nep1.txt
replicate 4 4 4
velocity 300
time_step 1
ensemble nve
engine dense
dump_observer observe 5 10 1 1
run 10
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    o0 = np.loadtxt(tmp_path / "observer0.out")
    o1 = np.loadtxt(tmp_path / "observer1.out")
    o0 = o0.reshape(-1, 18)
    o1 = o1.reshape(-1, 18)
    assert o0.shape == (2, 18) and o1.shape == (2, 18)
    assert np.allclose(o0, o1, rtol=1e-8)
    assert np.isfinite(o0).all()
    # round 5: observer models must have evaluated on the COMPACT pipeline
    # (driver's plan + neighbor build), not the per-frame list path
    assert getattr(s, "_observer_compact_evals", 0) >= 4
    # cross-check the compact observer forces against an independent
    # list-path evaluation on the dumped frame's own positions
    import jax.numpy as jnp

    from gpumd_tpu.model.state import make_state

    frames = read_xyz_frames(str(tmp_path / "observer0.xyz"))
    fr = frames[-1]
    n = len(fr.positions)
    st = make_state(fr.positions, np.ones(n), np.asarray(s.state.type)[:n],
                    s.state.box)
    out = s.ff._evaluate_with(st, s.potentials[0])
    np.testing.assert_allclose(
        np.asarray(fr.forces), np.asarray(out.force)[:n],
        rtol=2e-4, atol=5e-6)
