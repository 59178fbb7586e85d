#!/usr/bin/env python
"""Drift localization, phase 2 (CPU, x64): load the thermalized snapshot
from scripts/drift_localize.py and compute the list-path forces in f64 as
ground truth.  Reports compact-force error statistics and localizes them:
per-atom |dF| binned by grid-cell x index mod bx (window-block position),
by boundary-vs-interior cell, and the top-10 worst atoms with their cell
coordinates — enough to tell a fold/pack edge bug from uniform f32 noise.

Run with JAX_PLATFORMS=cpu.  Env: GPUMD_DL_OUT (npz from phase 1).
"""

import json
import os
import sys

import jax

# the image's site config force-appends the accelerator platform; the env
# var alone is not enough (tests/conftest.py does the same)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gpumd_tpu.forcefield import ForceField
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP

    d = np.load(os.environ.get("GPUMD_DL_OUT", "/tmp/drift_local.npz"))
    mask = d["mask"].astype(bool)
    pos = d["position"][mask].astype(np.float64)
    typ = d["type"][mask].astype(np.int32)
    massv = d["mass"][mask].astype(np.float64)
    f_c = d["force_c"][mask].astype(np.float64)
    pe_c = d["pe_c"][mask].astype(np.float64)
    lengths = d["lengths"].astype(np.float64)
    grid = d["grid"]
    n = int(mask.sum())

    nep = NEP.from_file("/root/reference/examples/nep_train/nep.txt",
                        dtype=jnp.float64)
    box = Box.orthogonal(lengths, dtype=jnp.float64)
    state = make_state(pos, massv, typ, box, dtype=jnp.float64)
    ff = ForceField.create([nep], box, n, mn=200, skin=0.0)
    sl = ff.compute(state)
    f_l = np.asarray(sl.force, np.float64)
    pe_l = np.asarray(sl.potential_energy, np.float64)

    df = f_c - f_l
    dfn = np.linalg.norm(df, axis=1)
    fn = np.linalg.norm(f_l, axis=1)

    # cell coords of each atom
    frac = pos / lengths[None, :]
    cell = np.floor(frac * grid[None, :]).astype(int)
    cell = np.minimum(cell, grid[None, :] - 1)
    bx = int(d["bx"])

    def stats(sel, tag):
        if sel.sum() == 0:
            return {tag: None}
        return {tag: {
            "count": int(sel.sum()),
            "rms_dF": float(np.sqrt((dfn[sel] ** 2).mean())),
            "max_dF": float(dfn[sel].max()),
            "sum_dF": [float(x) for x in df[sel].sum(0)],
        }}

    rep = {
        "n": n,
        "sumF_list": [float(x) for x in f_l.sum(0)],
        "sumF_compact": [float(x) for x in f_c.sum(0)],
        "sum_dF": [float(x) for x in df.sum(0)],
        "rms_dF": float(np.sqrt((dfn ** 2).mean())),
        "max_dF": float(dfn.max()),
        "rms_F": float(np.sqrt((fn ** 2).mean())),
        "rms_dE": float(np.sqrt(((pe_c - pe_l) ** 2).mean())),
        "max_dE": float(np.abs(pe_c - pe_l).max()),
    }
    for ax, name in ((0, "x"), (1, "y"), (2, "z")):
        lo = cell[:, ax] == 0
        hi = cell[:, ax] == grid[ax] - 1
        rep.update(stats(lo | hi, f"boundary_{name}"))
    rep.update(stats(
        ~((cell == 0) | (cell == grid[None, :] - 1)).any(1), "interior"))
    for r in range(bx):
        rep.update(stats(cell[:, 0] % bx == r, f"xmod{bx}={r}"))
    worst = np.argsort(-dfn)[:10]
    rep["worst"] = [
        {"cell": [int(c) for c in cell[i]], "dF": float(dfn[i]),
         "F": float(fn[i])}
        for i in worst
    ]
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
