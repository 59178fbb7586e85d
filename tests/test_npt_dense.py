"""Barostats on the compact fast path (VERDICT round-3 item 5).

BASELINE config 3 is NEP MD *under NPT*; the reference runs NEP under every
ensemble through one production path (ref: src/main_gpumd/run.cu:252-318,
ensemble_ber.cu:95-150 rescales box + positions together).  The dense
engine's static grid plan must therefore stay exact while a barostat
rescales the cell:

  * rebuild criterion in fractional coordinates (the affine rescale drops
    out; smin scales the margin) — engine/dense_md.py make_step;
  * sticky overflow when the box shrinks below the grid's rc+skin cell
    margin (engine/dense_md.py _cells_valid).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.engine.dense_md import DenseNEPMD
from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.integrate.ensembles.npt import NPTBerendsen
from gpumd_tpu.integrate.run import make_md_step
from gpumd_tpu.integrate.velocity import initialize_velocity
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import NepModel, random_params
from gpumd_tpu.units import TIME_UNIT_CONVERSION

pytestmark = pytest.mark.slow  # interpret-mode compact kernels


def _nep():
    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(8.0, 8.0), rc_angular=(4.0, 4.0),
        mn_radial=96, mn_angular=24, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=2,
        has_q=(0,) * 6, neurons=10,
    )
    return NEP(model=model, params=random_params(model, seed=7))


def _system(n=256, L=28.0):
    rng = np.random.default_rng(9)
    nx = int(np.ceil(n ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(nx)] * 3, indexing="ij"), -1)
    pos = grid.reshape(-1, 3)[:n] * (L / nx)
    pos += rng.uniform(-0.3, 0.3, pos.shape)
    types = rng.integers(0, 2, n)
    box = Box.orthogonal([L] * 3)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, 300.0, seed=4)
    return state, pos, types, box


def test_npt_dense_matches_list_path():
    nep = _nep()
    state, pos, types, box = _system()
    n = len(pos)
    dt = 1.0 / TIME_UNIT_CONVERSION
    n_steps = 12
    # strong coupling so the box visibly moves in a few steps
    ens = NPTBerendsen(
        t0=300.0, target_pressure=(2.0, 2.0, 2.0),
        elastic_modulus=(5.0, 5.0, 5.0), tau_p=20.0,
    )

    # list path (golden-validated forces)
    ff = ForceField.create([nep], box, n, mn=160, skin=1.0)
    st = ff.compute(state)
    cache = ff.refresh_cache(st)
    step = make_md_step(ff, ens, dt, observer=lambda s: 0)
    aux = ens.init(st)
    (st, aux, cache), _ = jax.lax.scan(
        step, (st, aux, cache), length=n_steps)
    h_list = np.asarray(st.box.h)

    # dense fast path
    md = DenseNEPMD(nep, box, n, position=pos, skin=1.0, interpret=True)
    assert md.engine == "compact"
    carry, aux_d = md.run(state, ens, dt, n_steps)
    assert not bool(carry.overflow)
    snap = md.to_input_order(carry, n)
    h_dense = np.asarray(snap.box.h)

    # the barostat actually moved the box
    assert abs(h_list[0, 0] - 28.0) > 1e-4
    np.testing.assert_allclose(h_dense, h_list, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(snap.position), np.asarray(st.position)[: n],
        rtol=1e-6, atol=1e-7,
    )
    e_dense = float(jnp.sum(snap.potential_energy * snap.mask))
    e_list = float(jnp.sum(st.potential_energy * st.mask))
    np.testing.assert_allclose(e_dense, e_list, rtol=1e-8)


def test_npt_shrink_below_margin_flags_overflow():
    """A barostat crush past the grid's rc+skin cell margin must set the
    sticky overflow flag (the analog of the reference's neighbor abort)."""
    nep = _nep()
    state, pos, types, box = _system()
    n = len(pos)
    dt = 1.0 / TIME_UNIT_CONVERSION
    md = DenseNEPMD(nep, box, n, position=pos, skin=1.0, interpret=True)

    class Crusher:
        """Deterministic 1%/step box shrink (barostat stand-in: the actual
        pressure of a random-weight NEP is unknown, so drive the box
        directly)."""

        def init(self, state):
            return ()

        def step1(self, state, aux, dt):
            return state, aux

        def step2(self, state, aux, dt):
            s = 0.99
            return state._replace(
                position=state.position * s,
                box=state.box.with_h(state.box.h * s),
            ), aux

    # cells start at 28/3 = 9.33 A; rc+skin = 9 A.  The affine criterion
    # keeps the (still-valid) list until smin*rc_out < rc at ~12 steps of
    # 1%/step shrink; the forced rebuild then fails _cells_valid.
    carry, _ = md.run(state, Crusher(), dt, 20)
    assert bool(carry.overflow)
