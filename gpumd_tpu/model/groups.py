"""Grouping methods (ref: src/model/group.cuh:20-37).

A grouping method assigns every atom a group label (from model.xyz
`group:I:k` columns). Groups drive fixed/moving atoms, local thermostats,
and group-resolved observables.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np


class Groups:
    """Host-side group bookkeeping; device masks built on demand."""

    def __init__(self, labels: Optional[np.ndarray], n_pad: int):
        """labels: (N, n_methods) int array or None."""
        if labels is None:
            self.labels = np.zeros((n_pad, 0), dtype=np.int32)
        else:
            lab = np.asarray(labels, dtype=np.int32)
            pad = n_pad - lab.shape[0]
            if pad:
                lab = np.pad(lab, ((0, pad), (0, 0)), constant_values=-1)
            self.labels = lab
        self.n_methods = self.labels.shape[1]

    def num_groups(self, method: int) -> int:
        if self.labels.shape[0] == 0 or self.n_methods == 0:
            return 0
        return int(self.labels[:, method].max()) + 1

    def sizes(self, method: int) -> np.ndarray:
        ng = self.num_groups(method)
        return np.array(
            [(self.labels[:, method] == g).sum() for g in range(ng)]
        )

    def mask(self, method: int, group_id: int) -> jnp.ndarray:
        """(N,) float mask of membership."""
        return jnp.asarray(
            (self.labels[:, method] == group_id).astype(np.float64)
        )

    def onehot(self, method: int) -> jnp.ndarray:
        """(N, n_groups) float membership matrix for group reductions."""
        ng = self.num_groups(method)
        lab = self.labels[:, method]
        oh = np.zeros((len(lab), ng))
        valid = lab >= 0
        oh[np.arange(len(lab))[valid], lab[valid]] = 1.0
        return jnp.asarray(oh)
