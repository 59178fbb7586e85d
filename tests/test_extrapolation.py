"""compute_extrapolation: B-projection + MaxVol gamma active learning
(ref: extrapolation.cu, nep_utilities.cuh B_projection branch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpumd_tpu.io.xyz import XYZFrame, write_xyz
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import (
    NepModel, num_trainable, random_params, write_nep_txt,
)


def small_model():
    return NepModel(
        version=4, model_type=0, num_types=1, symbols=("Ar",),
        atomic_numbers=(18,), rc_radial=(6.0,), rc_angular=(4.0,),
        mn_radial=64, mn_angular=32, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=4,
        has_q=(0, 0, 0, 0, 0, 0), neurons=4,
    )


def test_b_projection_matches_autodiff():
    """B_i = dE_i/d(theta_ann of element t_i): summed over atoms it must
    equal the autodiff gradient of the total energy wrt (w0, b0, w1)."""
    model = small_model()
    params = random_params(model, seed=7)
    nep = NEP(model, params)
    rng = np.random.default_rng(1)
    n, mn = 6, 5
    r12 = jnp.asarray(rng.random((n, mn, 3)) * 3.0 + 1.0)
    t1 = jnp.zeros((n,), jnp.int32)
    t2 = jnp.zeros((n, mn), jnp.int32)

    b = nep.b_projection(r12, t1, t2)  # (n, neu*(dim+2))
    neu, dim = model.neurons, model.dim
    b = np.asarray(b).reshape(n, neu, dim + 2)

    def e_tot(w0, b0, w1):
        p2 = params._replace(w0=w0, b0=b0, w1=w1)
        return jnp.sum(NEP(model, p2).per_atom_energy(r12, t1, t2))

    gw0, gb0, gw1 = jax.grad(e_tot, argnums=(0, 1, 2))(
        params.w0, params.b0, params.w1
    )
    assert np.allclose(b[:, :, :dim].sum(0), np.asarray(gw0[0]), atol=1e-4)
    assert np.allclose(b[:, :, dim].sum(0), np.asarray(gb0[0]), atol=1e-4)
    assert np.allclose(b[:, :, dim + 1].sum(0), np.asarray(gw1[0]), atol=1e-4)


def test_extrapolation_app(tmp_path):
    """App-level: identity ASI -> gamma = max |B_i|; dump file written and
    gamma_high abort triggers (ref: extrapolation.cu:197-221)."""
    from gpumd_tpu.app.gpumd import Session

    model = small_model()
    params = random_params(model, seed=3)
    theta = None  # write via write_nep_txt needs flat vector
    import gpumd_tpu.potentials.nep.params as P

    # build flat vector matching params_from_vector layout
    d = num_trainable(model)
    rng = np.random.default_rng(11)
    theta = rng.normal(size=d) * 0.3
    write_nep_txt(str(tmp_path / "nep.txt"), model, theta,
                  np.ones(model.dim))

    a0, nc = 5.26, 2
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.array(
        [[i, j, k] for i in range(nc) for j in range(nc) for k in range(nc)]
    )
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    frame = XYZFrame(
        symbols=["Ar"] * n, positions=pos,
        lattice=np.diag([nc * a0] * 3), pbc=(True,) * 3,
    )
    write_xyz(str(tmp_path / "model.xyz"), frame)

    bsize = model.neurons * (model.dim + 2)
    with open(tmp_path / "asi.txt", "w") as f:
        f.write(f"Ar {bsize} {bsize}\n")
        eye = np.eye(bsize)
        for row in eye:
            f.write(" ".join(f"{x:g}" for x in row) + "\n")

    (tmp_path / "run.in").write_text(
        """potential nep.txt
velocity 30
time_step 2
ensemble nve
compute_extrapolation asi_file asi.txt gamma_low 0.0 check_interval 10 dump_interval 10
run 30
"""
    )
    s = Session(str(tmp_path), quiet=True)
    s.execute()
    text = (tmp_path / "extrapolation_dump.xyz").read_text()
    assert "max_gamma=" in text and "gamma:R:1" in text
    # gamma_low 0 dumps every dump_interval: 3+ frames
    assert text.count("max_gamma=") >= 3

    # abort path: absurdly low gamma_high
    (tmp_path / "run.in").write_text(
        """potential nep.txt
velocity 30
time_step 2
ensemble nve
compute_extrapolation asi_file asi.txt gamma_high 1e-30
run 20
"""
    )
    (tmp_path / "extrapolation_dump.xyz").unlink()
    s2 = Session(str(tmp_path), quiet=True)
    with pytest.raises(RuntimeError, match="extrapolation grade"):
        s2.execute()
