#!/usr/bin/env python
"""Microbenchmark: Pallas banded gather (sublane dynamic_gather) vs XLA gather.

Measures the primitive underpinning the planned hot path: gathering
neighbor positions/partials from a VMEM-resident window (atoms sorted by
cell, so indices are window-local) instead of HBM random gathers.

Task shape mirrors r12 assembly at 256k atoms: ~29M lookups from
per-row windows of ~11k entries.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

W = int(os.environ.get("W", 11200))  # window rows (multiple of 8)
S = int(os.environ.get("S", 1024))  # gather rows per grid step
G = int(os.environ.get("G", 256))  # grid steps
LANES = 128


def kern(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(table_ref[...], idx_ref[...], axis=0)


def pallas_gather(table, idx):
    # table: (G, W, 128) — per-step window; idx: (G, S, 128)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, W, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, S, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, LANES), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, LANES), table.dtype),
    )(table, idx)


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (G, W, LANES), jnp.float32)
    idx = jax.random.randint(key, (G, S, LANES), 0, W, jnp.int32)

    total = G * S * LANES

    fp = jax.jit(pallas_gather)
    try:
        out = fp(table, idx)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"PALLAS FAILED: {type(e).__name__}: {str(e)[:2000]}")
        fp = None

    if fp is not None:
        t0 = time.time()
        for _ in range(5):
            out = fp(table, idx)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 5
        print(f"pallas banded: {dt*1e3:.2f} ms -> {total/dt/1e9:.2f} G elem/s")

    # XLA baseline: same gather via take_along_axis on the full arrays
    fx = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))
    out = fx(table, idx)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = fx(table, idx)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"xla take_along: {dt*1e3:.2f} ms -> {total/dt/1e9:.2f} G elem/s")

    # XLA flat random gather baseline (the round-1 wall)
    flat_tab = jax.random.normal(key, (G * W,), jnp.float32)
    flat_idx = jax.random.randint(key, (total,), 0, G * W, jnp.int32)
    ff = jax.jit(lambda t, i: t[i])
    out = ff(flat_tab, flat_idx)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = ff(flat_tab, flat_idx)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    print(f"xla flat gather: {dt*1e3:.2f} ms -> {total/dt/1e9:.2f} G elem/s")


if __name__ == "__main__":
    main()
