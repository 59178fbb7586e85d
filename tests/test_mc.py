"""Hybrid MCMD: canonical swaps preserve composition; SGC shifts it."""

import numpy as np

from gpumd_tpu.app.gpumd import Session
from gpumd_tpu.io.xyz import XYZFrame, write_xyz


def make_binary_lj(tmp_path, nc=2):
    a0 = 5.0
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    symbols = ["Ar" if i < n // 2 else "Kr" for i in range(n)]
    frame = XYZFrame(
        symbols=symbols, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)
    (tmp_path / "lj.txt").write_text(
        "lj 2 Ar Kr\n"
        "1.032e-2 3.405 8.0\n"
        "1.2e-2 3.5 8.0\n"
        "1.2e-2 3.5 8.0\n"
        "1.4e-2 3.65 8.0\n"
    )
    return n


def test_canonical_mcmd_preserves_composition(tmp_path):
    n = make_binary_lj(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 50
time_step 5
ensemble nvt_lan 50 50 100
mc canonical 20 5 50 50
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    out = np.loadtxt(tmp_path / "mcmd.out")
    assert out.shape == (5, 2)
    types = np.asarray(s.state.type)[:n]
    assert (types == 0).sum() == n // 2  # composition conserved


def test_sgc_mcmd_changes_composition(tmp_path):
    n = make_binary_lj(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 50
time_step 5
ensemble nvt_lan 50 50 100
mc sgc 20 10 50 50 2 Ar 0.0 Kr -2.0
run 100
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    types = np.asarray(s.state.type)[:n]
    # reference sign: dE += mu_new - mu_old (mc_ensemble_sgc.cu:466),
    # so a NEGATIVE mu for Kr favors converting atoms to Kr
    assert (types == 1).sum() > n // 2


def test_vcsgc_runs_and_constrains(tmp_path):
    """VC-SGC with huge kappa pins the concentration near its start
    (variance constraint, ref: mc_ensemble_sgc.cu:465-471)."""
    n = make_binary_lj(tmp_path)
    (tmp_path / "run.in").write_text(
        """potential lj.txt
velocity 50
time_step 5
ensemble nvt_lan 50 50 100
mc vcsgc 20 10 50 50 2 Ar 0.0 Kr 0.0 1.0e4
run 60
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    out = np.loadtxt(tmp_path / "mcmd.out")
    assert out.shape[1] == 4  # step, acceptance, 2 concentrations
    types = np.asarray(s.state.type)[:n]
    # phi = 0 for both species: the variance constraint's target is the
    # starting concentration; large kappa pins the composition there
    # (bracket N dphi + 2 dN + 1 of mc_ensemble_sgc.cu:469-471)
    assert abs(int((types == 1).sum()) - n // 2) <= n // 8


def test_nep_local_de_matches_global(tmp_path):
    """The local-cluster NEP dE path reproduces the global-dE trial
    trajectory (ref: nep_energy.cu local evaluator vs full sum)."""
    import jax

    from gpumd_tpu.forcefield import ForceField
    from gpumd_tpu.io.xyz import read_xyz
    from gpumd_tpu.mc.mcmd import MCMD
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep import NEP

    nep = NEP.from_file(
        "/root/reference/tests_pytest/fixtures/models/nep_BaZrO3.txt"
    )
    frame = read_xyz(
        "/root/reference/tests_pytest/fixtures/structures/BaZrO3-nat40-rattled.xyz"
    )
    types = np.asarray([nep.model.symbols.index(s) for s in frame.symbols])
    masses = np.asarray([137.3 if t == 0 else (91.2 if t == 1 else 16.0)
                         for t in types])
    box = Box.from_lattice(frame.lattice, pbc=frame.pbc)
    state = make_state(frame.positions, masses, types, box)
    ff = ForceField.create([nep], box, len(types), mn=256, skin=0.0)

    mc = MCMD(kind="canonical", num_steps_md=1, num_steps_mc=6,
              t_initial=600.0, t_final=600.0)
    local = mc._make_local_trials(ff, nep)
    glob = mc._make_global_trials(ff)
    key = jax.random.PRNGKey(7)
    s_l, _, na_l = local(state, key, 600.0)
    s_g, _, na_g = glob(state, key, 600.0)
    assert int(na_l) == int(na_g)
    assert (np.asarray(s_l.type) == np.asarray(s_g.type)).all()
    assert np.allclose(np.asarray(s_l.velocity), np.asarray(s_g.velocity))
