"""Compile-only collective-schedule regression for the sharded engine
(VERDICT r4 item 10): AOT-lower the sharded compact MD step over an
8-device mesh and assert the ppermute schedule matches the single-ring
design (ref: nep_multigpu.cu:1585-1802 moves halos point-to-point twice
per force call; here each force call is exactly 4 ring exchanges = 8
`collective_permute` ops, and no all_gather/all_to_all sneaks in).

The 8 permutes per step, from engine/sharded.py:
  2  position ghost rows       (_ring_halo: up + down), force pass
  2  ghost-row K1 cotangents   (window-free compaction return path)
  2  ghost-row value rows      (compact source ghost pad)
  2  scatter-fold seam returns (fold ghost cotangent rows to owners)
A schedule regression (e.g. an accidental all_gather of the full state,
or a resharding permute XLA inserts around a layout mismatch) changes
these counts and fails loudly here without needing TPU hardware.
"""

import re

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gpumd_tpu.engine.sharded import AXIS, ShardedDenseMD
from gpumd_tpu.integrate.ensembles.nve import NVE
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import NepModel, random_params
from gpumd_tpu.units import TIME_UNIT_CONVERSION


def test_sharded_compact_collective_schedule():
    devs = np.array(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(devs, (AXIS,))

    rng = np.random.default_rng(5)
    tiny = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(4.0, 4.0), rc_angular=(2.5, 2.5),
        mn_radial=48, mn_angular=16, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=2,
        has_q=(0,) * 6, neurons=4,
    )
    nep = NEP(model=tiny, params=random_params(tiny, seed=7,
                                               dtype=jnp.float64))
    a0, nc = 3.3, 11
    g = np.stack(
        np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"), -1).reshape(-1, 3)
    pos = (g + 0.5) * a0 + rng.uniform(-0.2, 0.2, (nc**3, 3))
    types = rng.integers(0, 2, len(pos))
    box = Box.orthogonal([nc * a0] * 3)
    n = len(pos)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box,
                       dtype=jnp.float64)

    smd = ShardedDenseMD(nep, box, n, mesh, position=pos, skin=0.5,
                         interpret=True, per_atom_virial=True)
    assert smd.engine == "compact"
    sstate, oid, overflow = smd.bin_state(state, with_id=True)
    _, compute = smd.make_block(NVE(), 1.0 / TIME_UNIT_CONVERSION, steps=1)

    txt = jax.jit(compute).lower(sstate).as_text()
    counts = {
        op: len(re.findall(op, txt))
        for op in ("collective_permute", "all_gather", "all_to_all",
                   "reduce_scatter")
    }
    # the single-ring design: exactly 4 up/down exchange pairs per step
    assert counts["collective_permute"] == 8, counts
    # nothing may widen to full-mesh collectives: halo traffic must stay
    # point-to-point over the ring (ICI neighbors), like the reference's
    # D2D slab copies
    assert counts["all_gather"] == 0, counts
    assert counts["all_to_all"] == 0, counts

    # document the halo bytes the schedule moves per step at this size:
    # each collective_permute's operand shape is in the lowered text
    shapes = re.findall(
        r"collective_permute.*?tensor<([0-9x]+)x(f32|f64|i32)", txt)
    byte_per = {"f32": 4, "f64": 8, "i32": 4}
    total = 0
    for dims, dt in shapes:
        sz = 1
        for d in dims.split("x"):
            sz *= int(d)
        total += sz * byte_per[dt]
    # halo traffic is O(slab cross-section): one ghost cell layer each way
    # for positions (4ch) + K1 cotangent rows (~wch ch).  At this tiny test
    # size a cell layer is a large fraction of the slab (nz=8 layers, 1 per
    # shard); at 1M atoms (grid 24x34x34 z-sharded over 8) the same 8
    # permutes move ~2 of 34 z-layers x ~20ch = a few percent of state.
    # The pinned regression is the COUNT above; here just require the
    # permutes to be cross-section-sized (< the full ghosted value rows)
    # and nonzero.
    state_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(sstate)
        if hasattr(leaf, "dtype")
    )
    assert 0 < total < state_bytes, (total, state_bytes)
