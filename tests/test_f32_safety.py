"""f32 robustness: padded far-away neighbor slots must not poison results
(regression: Chebyshev recurrence overflowed to inf*0=NaN in f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import NepModel, random_params


@pytest.mark.slow
def test_nep_f32_finite_with_far_padding():
    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(8.0, 8.0), rc_angular=(4.0, 4.0),
        mn_radial=92, mn_angular=16, n_max_radial=6, n_max_angular=6,
        basis_size_radial=6, basis_size_angular=6, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=30,
    )
    nep = NEP(model=model, params=random_params(model, seed=1, dtype=jnp.float32))
    rng = np.random.default_rng(2)
    n = 40
    pos = rng.uniform(0, 13.0, (n, 3)).astype(np.float32)
    box = Box.orthogonal(jnp.asarray([13.0, 13.0, 13.0], jnp.float32))
    state = make_state(pos, np.full(n, 100.0), rng.integers(0, 2, n), box,
                       n_pad=64)
    # plenty of padded slots: mn much larger than real neighbor counts
    ff = ForceField.create([nep], box, n, mn=512)
    out = ff.compute(state)
    assert out.position.dtype == jnp.float32
    assert np.isfinite(np.asarray(out.force)).all()
    assert np.isfinite(np.asarray(out.potential_energy)).all()
    assert np.isfinite(np.asarray(out.virial)).all()

    # f32 energies agree with f64 to f32 precision
    state64 = make_state(
        pos.astype(np.float64), np.full(n, 100.0), state.type[:n],
        Box.orthogonal([13.0, 13.0, 13.0]), n_pad=64,
    )
    nep64 = NEP(model=model, params=jax.tree.map(
        lambda x: x.astype(jnp.float64), nep.params))
    ff64 = ForceField.create([nep64], Box.orthogonal([13.0, 13.0, 13.0]), n, mn=512)
    out64 = ff64.compute(state64)
    e32 = float(jnp.sum(out.potential_energy))
    e64 = float(jnp.sum(out64.potential_energy))
    assert np.isclose(e32, e64, rtol=2e-4), (e32, e64)
