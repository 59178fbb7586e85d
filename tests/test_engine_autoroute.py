"""`engine auto` routing (VERDICT round-3 item 6): eligible runs hit the
compact fast path without the non-reference `engine` keyword; ineligible
runs fall back to the list path with a reason.

The reference has one hot path — force.cu:514-565 dispatches by potential
with no user-facing engine switch.  On CPU the decision is always "list"
(interpret-mode Pallas is slower than the XLA list path), so the routing
predicate is exercised here by faking the backend query.
"""

import numpy as np
import pytest

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.integrate.ensembles.nve import NVE
from gpumd_tpu.integrate.ensembles.npt import NPTBerendsen
from gpumd_tpu.integrate.ensembles.ti import TI
from gpumd_tpu.model.box import Box


def _nep_session(tmp_path, nc=6, a0=5.5):
    """Rocksalt 2-type system big enough for a >=3-cell grid plan."""
    import shutil

    shutil.copy("/root/reference/tests_pytest/fixtures/models/nep_C.txt",
                tmp_path / "nep.txt")
    base = np.array(
        [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
    cells = np.stack(
        np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"), -1).reshape(-1, 3)
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    lines = [f"{n}",
             f'Lattice="{nc*a0} 0 0 0 {nc*a0} 0 0 0 {nc*a0}" '
             'Properties=species:S:1:pos:R:3']
    for p in pos:
        lines.append(f"C {p[0]} {p[1]} {p[2]}")
    (tmp_path / "model.xyz").write_text("\n".join(lines) + "\n")
    (tmp_path / "run.in").write_text(
        "potential nep.txt\nvelocity 300\ntime_step 1\n")
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    return s


def test_auto_prefers_list_on_cpu(tmp_path):
    s = _nep_session(tmp_path)
    reason = s._dense_route_reason(NVE())
    assert reason is not None and "non-TPU" in reason


def test_auto_routes_eligible_run_on_tpu(tmp_path, monkeypatch):
    s = _nep_session(tmp_path)
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    assert s._dense_route_reason(NVE()) is None
    assert s._dense_route_reason(NPTBerendsen()) is None


def test_auto_falls_back_for_unsupported(tmp_path, monkeypatch):
    s = _nep_session(tmp_path)
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    # TI ensembles are list-path-only
    reason = s._dense_route_reason(TI())
    assert reason is not None and "ensemble" in reason
    # thin box: no grid plan
    s2 = _nep_session(tmp_path, nc=2)
    assert "box too thin" in s2._dense_route_reason(NVE())
