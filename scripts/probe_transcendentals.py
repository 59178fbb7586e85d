#!/usr/bin/env python
"""Accuracy of in-kernel (Mosaic) transcendentals vs f64 — drift hunt.

The compact kernels compute rsqrt/cos/sin inside Pallas and K2
differentiates through them analytically; if Mosaic lowers them to fast
approximations (relative error >> f32 eps), the force is not the gradient
of the energy and NVE drifts (classic fast-math mechanism).  Prints max/rms
relative error over representative argument ranges for pallas-kernel ops
and plain XLA ops on the same device.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def kernel(x_ref, o1, o2, o3):
    x = x_ref[...]
    o1[...] = jax.lax.rsqrt(x)
    o2[...] = jnp.cos(x)
    o3[...] = jnp.sin(x)


def run(x):
    shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    return pl.pallas_call(
        kernel, out_shape=[shape, shape, shape],
        interpret=jax.default_backend() != "tpu",
    )(x)


def main():
    out = {}
    for name, lo, hi in (("pair_d2", 1.0, 120.0), ("angle", 0.0, 3.2)):
        xs = np.linspace(lo, hi, 8 * 1024, dtype=np.float32).reshape(8, -1)
        x = jnp.asarray(xs)
        r1, r2, r3 = (np.asarray(v, np.float64) for v in run(x))
        x1, x2, x3 = (np.asarray(v, np.float64) for v in (
            jax.jit(jax.lax.rsqrt)(x), jax.jit(jnp.cos)(x),
            jax.jit(jnp.sin)(x)))
        xd = xs.astype(np.float64)
        ref = (1.0 / np.sqrt(xd), np.cos(xd), np.sin(xd))
        for label, kv, xv, rv in (
            ("rsqrt", r1, x1, ref[0]), ("cos", r2, x2, ref[1]),
            ("sin", r3, x3, ref[2]),
        ):
            scale = np.maximum(np.abs(rv), 1e-3)
            out[f"{name}.{label}"] = {
                "pallas_max_rel": float(np.max(np.abs(kv - rv) / scale)),
                "pallas_rms_rel": float(np.sqrt(np.mean(
                    ((kv - rv) / scale) ** 2))),
                "xla_max_rel": float(np.max(np.abs(xv - rv) / scale)),
            }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
