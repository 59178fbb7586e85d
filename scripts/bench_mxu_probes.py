#!/usr/bin/env python
"""Measured v5e envelope for MXU-formulated NEP pair math (VERDICT r4 #1).

The round-4 proposal projected moving K1/K2's ~165 Gflop of pair math onto
the MXU as batched (A x K) x (K x CH) bf16 matmuls.  This script MEASURES
the candidate formulations as standalone Pallas kernels at the exact 1M-atom
tile geometry the compact engine uses (nb=13,872 blocks, a_pad=128,
mn_r=112, mn_a=32, wl=2304), so PERF_NOTES can carry a measured — not
projected — envelope, and so the scatter/gather levers are picked from data.

Probes (each prints ms/step-equivalent at 1M):
  feature_matmul  (pairs, K) @ (K, CH) per-pair feature contraction — the
                  proposal's core op.  This is the part of pair math that
                  CAN ride the MXU (c-table contractions).
  onehot_*        the scatter dot in its current shape and variants:
                  K-split x4 (multi-MXU test), single-precision rows
                  (M 144->72), mn_a 24 (K 4096->3072), compact-lane output
                  (M 88, one M-tile).
  pair_reduce_vpu the irreducible VPU op: sum_m gn[m,a]*ylm[m,a] over
                  168 (n,lm) channels — accumulate-spill layout vs
                  register-tiled loop order.
  bgather         the blocked in-kernel gather rate (K2's dominant term)
                  at nblk_src = 18 (round-4 windows) vs 11 (round-5
                  compact lists).

Run on the TPU: python scripts/bench_mxu_probes.py
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

NB_FULL = 13872  # blocks at 1M (grid 24x34x34, bx 2)
# probe at NB_FULL/8 and scale: the worst probe input at full NB is
# (13872, 144, 4096) f32 = 32.7 GB — 2x v5e HBM (measured OOM, round 5).
# Per-block cost is NB-linear (one grid step per block), so the scaled
# measurement is faithful.
SCALE = int(os.environ.get("GPUMD_PROBE_SCALE", "8"))
NB = NB_FULL // SCALE
A = 128     # atom lanes per block


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        # force a real host sync (axon tunnel: block_until_ready alone can
        # return early, PERF_NOTES round-2 item 1)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - t0)
    return best


# ---------------------------------------------------------------------------
# onehot scatter dot variants
# ---------------------------------------------------------------------------


def _dot_kernel(m, k, n, ksplit, v_ref, o_ref, *, prec):
    lhs = v_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, n), 1)
    rhs = jnp.where((iota * 7919) % n == iota, 1.0, 0.0).astype(lhs.dtype)
    if ksplit == 1:
        acc = jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=lhs.dtype, precision=prec)
    else:
        kc = k // ksplit
        parts = [
            jax.lax.dot_general(
                lhs[:, i * kc:(i + 1) * kc], rhs[i * kc:(i + 1) * kc],
                (((1,), (0,)), ((), ())),
                preferred_element_type=lhs.dtype, precision=prec)
            for i in range(ksplit)
        ]
        acc = sum(parts)
    o_ref[0] = acc


def onehot_dot(m, k, n, ksplit=1, prec=jax.lax.Precision.DEFAULT):
    vals = jnp.ones((NB, m, k), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_dot_kernel, m, k, n, ksplit, prec=prec),
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, m, k), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, m, n), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, m, n), jnp.float32),
    )
    return timeit(jax.jit(lambda v: f(v)), vals)


# ---------------------------------------------------------------------------
# feature matmul: the MXU-formulated per-pair c-table contraction
# ---------------------------------------------------------------------------


def _feat_kernel(mn, k, ch, v_ref, o_ref):
    # (mn*? , A) tiles: contract a constant (ch, k) table against k
    # per-pair feature rows for each of mn neighbor slots -> this is the
    # orientation the proposal calls (A x K) x (K x CH): with atoms on
    # lanes the dot runs (ch, k) @ (k, A) per neighbor slot, K=features.
    tbl = jnp.eye(ch, k, dtype=jnp.float32)
    acc = None
    for mchunk in range(mn // 8):
        feats = v_ref[0, mchunk * 8 * k:(mchunk + 1) * 8 * k, :]
        # per 8-slot chunk: one (ch, 8k) @ (8k, A) dot — all 8 slots stacked
        # on the contraction axis like the scatter kernel does
        big = jnp.concatenate([tbl] * 8, axis=1)
        r = jax.lax.dot_general(
            big.astype(jnp.float32), feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        acc = r if acc is None else acc + r
    o_ref[...] = acc.reshape(1, ch, A)


def feature_matmul(mn=32, k=8, ch=24):
    vals = jnp.ones((NB, mn * k, A), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_feat_kernel, mn, k, ch),
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, mn * k, A), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, ch, A), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, ch, A), jnp.float32),
    )
    return timeit(jax.jit(lambda v: f(v)), vals)


# ---------------------------------------------------------------------------
# the irreducible pair reduce on VPU: two loop orders
# ---------------------------------------------------------------------------


def _reduce_spill_kernel(na, nlm, chunks, g_ref, y_ref, o_ref):
    # accumulate all na*nlm channels across chunks (round-4 K1 layout:
    # accumulators live across the chunk loop -> VMEM spill traffic)
    acc = [[None] * nlm for _ in range(na)]
    for c in range(chunks):
        gs = [g_ref[0, c * 8 * na + n * 8:c * 8 * na + (n + 1) * 8, :]
              for n in range(na)]
        ys = [y_ref[0, c * 8 * nlm + m * 8:c * 8 * nlm + (m + 1) * 8, :]
              for m in range(nlm)]
        for n in range(na):
            for m in range(nlm):
                v = gs[n] * ys[m]
                acc[n][m] = v if acc[n][m] is None else acc[n][m] + v
    ch = 0
    for n in range(na):
        for m in range(nlm):
            o_ref[0, ch:ch + 1, :] = jnp.sum(acc[n][m], 0, keepdims=True)
            ch += 1


def _reduce_tiled_kernel(na, nlm, chunks, g_ref, y_ref, o_ref):
    # channel-outer loop order: accumulator lives in registers, gn/ylm
    # tiles re-read from VMEM (they were written once)
    ch = 0
    for n in range(na):
        for m in range(nlm):
            acc = None
            for c in range(chunks):
                g = g_ref[0, c * 8 * na + n * 8:c * 8 * na + (n + 1) * 8, :]
                y = y_ref[0, c * 8 * nlm + m * 8:c * 8 * nlm + (m + 1) * 8, :]
                v = g * y
                acc = v if acc is None else acc + v
            o_ref[0, ch:ch + 1, :] = jnp.sum(acc, 0, keepdims=True)
            ch += 1


def pair_reduce(kernel, na=7, nlm=24, chunks=4):
    g = jnp.ones((NB, chunks * 8 * na, A), jnp.float32)
    y = jnp.ones((NB, chunks * 8 * nlm, A), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kernel, na, nlm, chunks),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, chunks * 8 * na, A), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, chunks * 8 * nlm, A), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, na * nlm, A), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, na * nlm, A), jnp.float32),
    )
    return timeit(jax.jit(lambda a, b: f(a, b)), g, y)


# ---------------------------------------------------------------------------
# blocked gather rate (the K2 term)
# ---------------------------------------------------------------------------


def _bgather_kernel(nch, chunks, nblk, s_ref, i_ref, o_ref):
    srcs = [pltpu.repeat(s_ref[0, c:c + 1, :], 8, 0) for c in range(nch)]
    out = [None] * nch
    for r in range(chunks):
        idx8 = i_ref[0, r * 8:(r + 1) * 8, :]
        lo = idx8 & 127
        blk = idx8 >> 7
        accs = [None] * nch
        for b in range(nblk):
            sel = blk == b
            for i in range(nch):
                g = jnp.take_along_axis(
                    srcs[i][:, b * 128:(b + 1) * 128], lo, axis=1)
                g = jnp.where(sel, g, 0.0)
                accs[i] = g if accs[i] is None else accs[i] + g
        for i in range(nch):
            out[i] = accs[i] if out[i] is None else out[i] + accs[i]
    for i in range(nch):
        o_ref[0, i:i + 1, :] = jnp.sum(out[i], 0, keepdims=True)


def bgather(nch=17, chunks=14, nblk=18):
    src = jnp.ones((NB, nch, nblk * 128), jnp.float32)
    idx = jnp.zeros((NB, chunks * 8, A), jnp.int32)
    f = pl.pallas_call(
        functools.partial(_bgather_kernel, nch, chunks, nblk),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, nch, nblk * 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, chunks * 8, A), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nch, A), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, nch, A), jnp.float32),
    )
    return timeit(jax.jit(lambda s, i: f(s, i)), src, idx)


def main():
    res = {}
    # scatter dot variants: (rows, K, N) as (block-stacked) one-hot dots
    res["onehot_current_144x4096x128"] = onehot_dot(144, 4096, 128)
    res["onehot_ksplit4"] = onehot_dot(144, 4096, 128, ksplit=4)
    res["onehot_single_prec_72rows"] = onehot_dot(72, 4096, 128)
    res["onehot_mna24_144x3072x128"] = onehot_dot(144, 3072, 128)
    res["onehot_compact_88x3072x128"] = onehot_dot(88, 3072, 128)
    # one M-tile vs two: the NVE scatter's 144 rows are 108 useful
    # (nblk x (3 hi + 3 lo)) + vreg-alignment padding — if the M=108 dot
    # runs ~2x the M=144 one, tight row packing is the scatter lever
    res["onehot_packed_108x4096x128"] = onehot_dot(108, 4096, 128)
    res["onehot_packed_96x3072x128"] = onehot_dot(96, 3072, 128)
    # the MXU-formulated feature contraction (proposal core op)
    res["feature_matmul_mn32_k8_ch24"] = feature_matmul(32, 8, 24)
    res["feature_matmul_mn32_k8_ch168"] = feature_matmul(32, 8, 168)
    # the irreducible VPU pair reduce, two loop orders
    res["pair_reduce_spill"] = pair_reduce(_reduce_spill_kernel)
    res["pair_reduce_tiled"] = pair_reduce(_reduce_tiled_kernel)
    # blocked gather: round-4 windows vs round-5 compact lists
    res["bgather_17ch_nblk18"] = bgather(17, 14, 18)
    res["bgather_17ch_nblk11"] = bgather(17, 14, 11)
    res["bgather_17ch_nblk11_mnr96"] = bgather(17, 12, 11)
    res = {k: v * SCALE for k, v in res.items()}  # scale to NB_FULL
    for k, v in res.items():
        print(f"{k}: {v*1000:.1f} ms")
    print(json.dumps({k: round(v * 1000, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
