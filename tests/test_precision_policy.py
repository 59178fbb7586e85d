"""Force-path matmul-precision policy guard (VERDICT round-3 item 7).

TPU's DEFAULT matmul precision is a single bf16 MXU pass (~0.4% relative
noise per contraction); on a force path that noise is resampled every step
and rectifies into Langevin-like NVE heating (the round-3 drift hunt,
BASELINE.md).  The policy: every XLA-side contraction on a force path runs
under jax.default_matmul_precision("high") (bf16_3x) or better.  In-kernel
Mosaic dots may be DEFAULT only with a manual hi/lo operand split (the
one-hot scatter, engine/nep_compact.py _scatter_kernel) — those live inside
pallas_call sub-jaxprs, which this guard deliberately does not descend into
(their correctness is covered by the golden force tests + the drift gate).

This test traces each production force path to a jaxpr and fails if any
dot_general outside a Pallas kernel carries DEFAULT precision — the failure
mode is silent, so the guard must be structural, not statistical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model.box import Box
from gpumd_tpu.model.state import make_state
from gpumd_tpu.potentials.nep.params import NepModel, random_params
from gpumd_tpu.potentials.nep.model import NEP

_OK = (jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST)


def _iter_dots(jaxpr, in_pallas=False):
    """Yield (eqn, in_pallas) for every dot_general, walking sub-jaxprs."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            yield eqn, in_pallas
        child_pallas = in_pallas or ("pallas" in name)
        for v in eqn.params.values():
            for j in _sub_jaxprs(v):
                yield from _iter_dots(j, child_pallas)


def _sub_jaxprs(v):
    from jax._src.core import Jaxpr, ClosedJaxpr

    if isinstance(v, ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, Jaxpr):
        yield v
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _sub_jaxprs(x)


def _assert_policy(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args).jaxpr
    bad = []
    n_checked = 0
    for eqn, in_pallas in _iter_dots(jaxpr):
        if in_pallas:
            continue  # Mosaic dots: DEFAULT allowed with manual hi/lo split
        n_checked += 1
        prec = eqn.params.get("precision")
        if not (isinstance(prec, tuple) and all(p in _OK for p in prec)):
            bad.append((eqn, prec))
    assert n_checked > 0, "no XLA-side dots found — trace setup is wrong"
    assert not bad, (
        f"{len(bad)} XLA-side force-path dot_general(s) run below HIGH "
        f"precision: {[(str(e.outvars), p) for e, p in bad[:5]]}"
    )


def _small_nep(num_types=2):
    model = NepModel(
        version=4, model_type=0, num_types=num_types,
        symbols=("Te", "Pb")[:num_types],
        atomic_numbers=(52, 82)[:num_types],
        rc_radial=(8.0,) * num_types, rc_angular=(4.0,) * num_types,
        mn_radial=96, mn_angular=24, n_max_radial=2, n_max_angular=2,
        basis_size_radial=2, basis_size_angular=2, l_max=2,
        has_q=(0,) * 6, neurons=10,
    )
    return NEP(model=model, params=random_params(model, seed=7))


def _system(n=64, L=14.0):
    rng = np.random.default_rng(5)
    pos = rng.uniform(0, L, (n, 3))
    types = rng.integers(0, 2, n)
    return pos, types, Box.orthogonal([L] * 3)


def test_compact_nep_force_path_precision():
    from gpumd_tpu.engine.dense_md import DenseNEPMD

    nep = _small_nep()
    pos, types, box = _system(n=200, L=30.0)
    md = DenseNEPMD(nep, box, len(pos), position=pos, skin=0.5,
                    interpret=True, per_atom_virial=True)
    assert md.engine == "compact"
    state = make_state(pos, np.ones(len(pos)), types, box)
    carry = md.init_carry(state)
    _assert_policy(lambda s, i: md.compute(s, i).force, carry.state,
                   carry.idx)


def test_tersoff_compact_force_path_precision():
    from gpumd_tpu.engine.tersoff_compact import CompactTersoffMD
    from gpumd_tpu.potentials.tersoff import Tersoff1989

    pot = Tersoff1989.from_file(
        "/root/reference/potentials/tersoff/Si_Tersoff_1989.txt"
    )
    a0 = 5.431
    nc = 3
    base = np.array(
        [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
         [.25, .25, .25], [.75, .75, .25], [.75, .25, .75], [.25, .75, .75]]
    )
    cells = np.stack(
        np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"), -1).reshape(-1, 3)
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    box = Box.orthogonal([nc * a0] * 3)
    md = CompactTersoffMD(pot, box, len(pos), position=pos, skin=0.5,
                          interpret=True)
    state = make_state(pos, np.full(len(pos), 28.085),
                       np.zeros(len(pos), int), box)
    carry = md.init_carry(state)
    _assert_policy(lambda s, i: md.compute(s, i).force, carry.state,
                   carry.idx)


def test_list_path_force_precision():
    nep = _small_nep()
    pos, types, box = _system()
    n = len(pos)
    ff = ForceField.create([nep], box, n, mn=64)
    state = make_state(pos, np.ones(n), types, box)
    _assert_policy(lambda s: ff.compute(s).force, state)
