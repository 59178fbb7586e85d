"""Compensated (TwoSum) f32 integration: extended-precision Verlet.

The reference integrates in f64 (ref: src/model/atom.cuh:30-37); the TPU
engine is f32 with Kahan-compensated position/velocity accumulation
(integrate/verlet.py).  These tests pin down that:
  * two_sum_acc is exact (the error term captures the rounding loss),
  * compensated f32 Verlet tracks an f64 trajectory where plain f32
    accumulation visibly drifts (harmonic oscillator far from origin —
    the increment-to-magnitude ratio that kills plain f32).
"""

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.integrate.ensembles.nve import NVE
from gpumd_tpu.integrate.verlet import two_sum_acc
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state


def test_two_sum_exact():
    # accumulate many small increments into a large value: the (x, c) pair
    # must track the f64 sum to ~f64 precision even though x is f32
    x = jnp.asarray(1000.0, jnp.float32)
    c = jnp.asarray(0.0, jnp.float32)
    inc = jnp.asarray(1e-4, jnp.float32)
    ref = np.float64(1000.0)
    for _ in range(1000):
        x, c = two_sum_acc(x, c, inc)
        ref += np.float64(np.float32(1e-4))
    plain = np.float32(1000.0)
    for _ in range(1000):
        plain = np.float32(plain + np.float32(1e-4))
    err_comp = abs(float(x) + float(c) - ref)
    err_plain = abs(float(plain) - ref)
    assert err_comp < 1e-6
    assert err_plain > 1e-3  # plain f32 loses ~half the increments' low bits


def _ho_energy_drift(compensated: bool, n_steps=20000):
    """1-D harmonic oscillator at x0 = 50 A in f32; returns |dE|/E0."""
    k_spring = 1.0  # eV/A^2
    x0 = 50.0
    box = Box.orthogonal([200.0, 200.0, 200.0])
    state = make_state(
        np.array([[x0 + 0.3, 100.0, 100.0]]), np.array([20.0]),
        np.array([0]), box, dtype=jnp.float32, compensated=compensated,
    )
    ens = NVE()
    aux = ens.init(state)
    dt = 0.05

    def force(st):
        f = jnp.zeros_like(st.position)
        f = f.at[0, 0].set(-k_spring * (st.position[0, 0] - x0))
        return st._replace(force=f)

    state = force(state)

    def e_tot(st):
        x = float(st.position[0, 0])
        if st.position_c is not None:
            x += float(st.position_c[0, 0])
        v = np.asarray(st.velocity, np.float64)
        if st.velocity_c is not None:
            v = v + np.asarray(st.velocity_c, np.float64)
        ke = 0.5 * 20.0 * float(np.sum(v[0] ** 2))
        return 0.5 * k_spring * (x - x0) ** 2 + ke

    import jax

    @jax.jit
    def block(st, aux):
        def body(carry, _):
            st, aux = carry
            st, aux = ens.step1(st, aux, dt)
            st = force(st)
            st, aux = ens.step2(st, aux, dt)
            return (st, aux), None

        (st, aux), _ = jax.lax.scan(body, (st, aux), length=n_steps)
        return st, aux

    e0 = e_tot(state)
    state, aux = block(state, aux)
    e1 = e_tot(state)
    return abs(e1 - e0) / e0


def test_compensated_verlet_kills_f32_drift():
    drift_plain = _ho_energy_drift(False)
    drift_comp = _ho_energy_drift(True)
    # plain f32 at x~50 with dx~1e-3 per step loses ~1e-3 of each increment
    assert drift_comp < drift_plain / 20.0
    assert drift_comp < 2e-4
