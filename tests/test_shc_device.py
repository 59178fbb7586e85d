"""On-device SHC accumulation (VERDICT round-4 item: SHC without per-step
host syncs).

The device path carries (Nc, G, 3) ring buffers of the group's per-atom
(W row, v) inside the scan and updates all correlation lags per sample with
one MXU contraction (ref analog: src/measure/shc.cu processes SHC per step
on-GPU).  These tests check it against the host sample_state/postprocess
path on identical trajectories, including slot-permuted engine states.
"""

import os
import types

import numpy as np
import pytest

from gpumd_tpu.measure.properties import SHC
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state


def _traj(n, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    ws = rng.normal(size=(n_frames, n, 3, 3)).astype(np.float64)
    vs = rng.normal(size=(n_frames, n, 3)).astype(np.float64)
    return ws, vs


def _mk_state(n, box):
    pos = np.zeros((n, 3))
    return make_state(pos, np.ones(n), np.zeros(n, int), box)


def _session(tmp_path, n, state):
    return types.SimpleNamespace(
        workdir=str(tmp_path), _n=n, state=state
    )


def _run_host(tmp_path, n, ws, vs, state, **kw):
    shc = SHC(sample_interval=1, nc=6, direction=0, num_omega=10,
              max_omega=30.0, dt=0.1, **kw)
    sess = _session(tmp_path / "host", n, state)
    os.makedirs(sess.workdir, exist_ok=True)
    import jax.numpy as jnp

    for w, v in zip(ws, vs):
        st = state._replace(virial=jnp.asarray(w), velocity=jnp.asarray(v))
        shc.sample_state(sess, st, 0)
    shc.postprocess(sess)
    return np.loadtxt(os.path.join(sess.workdir, "shc.out"), comments="#")


def _run_device(tmp_path, n, ws, vs, state, perms=None, **kw):
    import jax.numpy as jnp

    shc = SHC(sample_interval=1, nc=6, direction=0, num_omega=10,
              max_omega=30.0, dt=0.1, **kw)
    sess = _session(tmp_path / "dev", n, state)
    os.makedirs(sess.workdir, exist_ok=True)
    macc = shc.device_init(sess, n)
    ident = np.arange(n, dtype=np.int32)
    for i, (w, v) in enumerate(zip(ws, vs)):
        perm = ident if perms is None else perms[i]
        # slot order: slot s holds input atom perm[s]
        st = state._replace(
            virial=jnp.asarray(w[perm]), velocity=jnp.asarray(v[perm])
        )
        macc = shc.device_update(macc, st, jnp.asarray(perm))
    shc.device_postprocess(sess, macc)
    return np.loadtxt(os.path.join(sess.workdir, "shc.out"), comments="#")


def test_device_matches_host(tmp_path):
    n, n_frames = 17, 15
    box = Box.orthogonal([10.0] * 3)
    state = _mk_state(n, box)
    ws, vs = _traj(n, n_frames)
    host = _run_host(tmp_path, n, ws, vs, state)
    dev = _run_device(tmp_path, n, ws, vs, state)
    assert host.shape == dev.shape
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-7)


def test_device_matches_host_permuted_slots(tmp_path):
    """The engine hands slot-permuted states between rebins; orig_id must
    keep correlations atom-aligned across permutation changes."""
    n, n_frames = 13, 12
    rng = np.random.default_rng(3)
    box = Box.orthogonal([10.0] * 3)
    state = _mk_state(n, box)
    ws, vs = _traj(n, n_frames, seed=1)
    perms = [rng.permutation(n).astype(np.int32) for _ in range(n_frames)]
    host = _run_host(tmp_path, n, ws, vs, state)
    dev = _run_device(tmp_path, n, ws, vs, state, perms=perms)
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-7)


def test_device_group_and_sample_interval(tmp_path):
    """Group selection + sample_interval gating: device_update is called
    every step but only samples on the interval."""
    import jax.numpy as jnp

    n, n_steps = 11, 24
    box = Box.orthogonal([10.0] * 3)
    state = _mk_state(n, box)
    ws, vs = _traj(n, n_steps, seed=2)
    gmask = (np.arange(n) % 3 == 0).astype(np.int32)

    shc_h = SHC(sample_interval=2, nc=4, direction=1, num_omega=5,
                max_omega=20.0, dt=0.5, group_mask=gmask)
    sess_h = _session(tmp_path / "h2", n, state)
    os.makedirs(sess_h.workdir, exist_ok=True)
    for i in range(n_steps):
        if (i + 1) % 2 == 0:
            st = state._replace(
                virial=jnp.asarray(ws[i]), velocity=jnp.asarray(vs[i])
            )
            shc_h.sample_state(sess_h, st, i)
    shc_h.postprocess(sess_h)
    host = np.loadtxt(os.path.join(sess_h.workdir, "shc.out"), comments="#")

    shc_d = SHC(sample_interval=2, nc=4, direction=1, num_omega=5,
                max_omega=20.0, dt=0.5, group_mask=gmask)
    sess_d = _session(tmp_path / "d2", n, state)
    os.makedirs(sess_d.workdir, exist_ok=True)
    macc = shc_d.device_init(sess_d, n)
    oid = jnp.arange(n, dtype=jnp.int32)
    for i in range(n_steps):
        st = state._replace(
            virial=jnp.asarray(ws[i]), velocity=jnp.asarray(vs[i])
        )
        macc = shc_d.device_update(macc, st, oid)
    shc_d.device_postprocess(sess_d, macc)
    dev = np.loadtxt(os.path.join(sess_d.workdir, "shc.out"), comments="#")
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-7)
