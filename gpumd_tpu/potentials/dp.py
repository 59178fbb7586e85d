"""DP (DeePMD-kit) bridge potential.

The reference links the DeepPot C++ API behind USE_DEEPMD
(ref: src/force/dp.cu:20-40, 374-520: box/coord marshalling, type map,
ghost-atom neighbor transfer).  Here the bridge goes through the
deepmd-kit PYTHON API instead (`deepmd.infer.DeepPot`), entered from the
jitted MD loop with `jax.pure_callback` — the model evaluates host-side
(deepmd brings its own neighbor machinery), and energies/forces/virials
flow back into the TPU pipeline as regular arrays.

If deepmd-kit is not installed the keyword raises the reference's
"DP potential requires ..." error instead of crashing at link time.

run.in: potential <dp_setting_file>   where the setting file holds
        `dp <num_types> <symbols...>` + the graph path (ref: dp.cu parse).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.potentials.base import PotentialOutput


def _load_deep_pot(graph_path: str):
    try:
        from deepmd.infer import DeepPot  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "DP potential requires the deepmd-kit python package "
            "(pip install deepmd-kit); it is not installed"
        ) from e
    return DeepPot(graph_path)


class DP(NamedTuple):
    """DeePMD bridge; `pot` is the host-side DeepPot handle (hashable via
    id — excluded from pytree flattening by living in a static field)."""

    graph_path: str
    symbols: tuple
    rc: float
    # host handle (created once at load; not a pytree leaf)
    handle_: object = None

    @staticmethod
    def from_file(path: str, workdir: str = ".") -> "DP":
        import os

        toks = open(path).read().split()
        assert toks[0] == "dp"
        t = int(toks[1])
        symbols = tuple(toks[2 : 2 + t])
        graph = toks[2 + t]
        if not os.path.isabs(graph):
            graph = os.path.join(os.path.dirname(os.path.abspath(path)),
                                 graph)
        handle = _load_deep_pot(graph)
        rc = float(handle.get_rcut())
        # map gpumd type index -> deepmd type index via the graph type map
        dp_map = list(handle.get_type_map())
        order = tuple(dp_map.index(s) for s in symbols)
        dp = DP(graph_path=graph, symbols=symbols, rc=rc, handle_=handle)
        return dp._replace(handle_=(handle, order))

    def compute_with_state(self, state, nbr) -> PotentialOutput:
        handle, order = self.handle_
        n_pad = state.position.shape[0]
        dtype = state.position.dtype
        order_arr = np.asarray(order, np.int64)

        def host_eval(pos, types, mask, h):
            pos = np.asarray(pos, np.float64)
            mask_b = np.asarray(mask) > 0
            n = int(mask_b.sum())
            coords = pos[mask_b].reshape(1, -1)
            atype = order_arr[np.asarray(types)[mask_b]]
            cell = np.asarray(h, np.float64).T.reshape(1, 9)
            e, f, v, ae, av = handle.eval(
                coords, cell, atype, atomic=True
            )
            energy = np.zeros((n_pad,), np.float64)
            force = np.zeros((n_pad, 3), np.float64)
            virial = np.zeros((n_pad, 3, 3), np.float64)
            energy[:n] = ae.reshape(-1)[:n]
            force[:n] = f.reshape(-1, 3)[:n]
            virial[:n] = av.reshape(-1, 9)[:n].reshape(n, 3, 3)
            return (energy.astype(dtype), force.astype(dtype),
                    virial.astype(dtype))

        shapes = (
            jax.ShapeDtypeStruct((n_pad,), dtype),
            jax.ShapeDtypeStruct((n_pad, 3), dtype),
            jax.ShapeDtypeStruct((n_pad, 3, 3), dtype),
        )
        e, f, v = jax.pure_callback(
            host_eval, shapes, state.position, state.type, state.mask,
            state.box.h,
        )
        return PotentialOutput(energy=e, force=f, virial=v)
