"""The `gnep` application: gradient-descent NEP training.

    python -m gpumd_tpu.app.gnep [workdir]

TPU-native analog of the reference gnep trainer (ref: src/main_gnep/):
Adam with decoupled weight decay and adaptive global-norm gradient
clipping (adam.cu:132-161, 236-285), a warmup + cosine LR schedule with
an optional cosine-restart variant (fitness.cu:317-371, keyword
lr_cos_restart), an epoch x shuffled-batch loop with Nc-weighted
epoch-mean RMSEs (fitness.cu:212-280), the reference's 10-column
loss.out rows (fitness.cu:502-527), per-epoch nep.txt + gnep.restart
checkpoints, and test-set evaluation when test.xyz is present
(report_error, fitness.cu:461-540).  Where the reference hand-writes
~3.5k lines of analytic parameter-gradient kernels (gradients.cuh), the
loss here is differentiated straight through the batched forward
(reverse-over-reverse autodiff for force errors) and XLA fuses the lot.

Resume: gnep.restart carries the parameter vector in the reference's
format; a sidecar gnep_adam.npz carries the Adam moments, step counter,
gradient-norm EMA, and epoch, so a resumed run continues bit-identically
(the reference restores parameters only, adam.cu:225-245).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from gpumd_tpu.io.nep_input import model_from_config, parse_nep_in
from gpumd_tpu.io.xyz import read_xyz_frames
from gpumd_tpu.potentials.nep.params import (
    num_trainable, params_from_vector, write_nep_txt,
)
from gpumd_tpu.train.nep_train import (
    GnepState, LossWeights, gnep_lr, loss_terms, make_gnep_step,
)
from gpumd_tpu.train.snes import compute_q_scaler


def main(argv=None, stop_after=None):
    """stop_after: optional epoch count to stop at (testing hook for the
    resume path; a killed run resumes the same way)."""
    argv = argv if argv is not None else sys.argv[1:]
    workdir = argv[0] if argv else "."
    cfg = parse_nep_in(os.path.join(workdir, "nep.in"))
    model = model_from_config(cfg)
    frames = read_xyz_frames(os.path.join(workdir, "train.xyz"))
    from gpumd_tpu.app.nep import build_batches

    batches = build_batches(
        frames, cfg.symbols, rc=model.rc_radial_max,
        batch_size=cfg.batch_size, model_type=cfg.model_type,
    )
    test_batches = []
    test_path = os.path.join(workdir, "test.xyz")
    if os.path.exists(test_path):
        test_batches = build_batches(
            read_xyz_frames(test_path), cfg.symbols,
            rc=model.rc_radial_max, batch_size=cfg.batch_size,
            model_type=cfg.model_type,
        )

    d = num_trainable(model)
    rng = np.random.default_rng(cfg.seed)
    theta0 = (rng.random(d) - 0.5) * 0.2
    q_scaler = compute_q_scaler(model, jnp.asarray(theta0, jnp.float32),
                                batches)

    restart_path = os.path.join(workdir, "gnep.restart")
    adam_path = os.path.join(workdir, "gnep_adam.npz")
    epoch0 = 0
    if os.path.exists(restart_path):
        theta0 = np.loadtxt(restart_path).reshape(-1)
        if theta0.shape[0] != d:
            raise ValueError(
                f"gnep.restart has {theta0.shape[0]} parameters, "
                f"model needs {d}")
        print(f"resuming parameters from {restart_path}")
    params = params_from_vector(model, jnp.asarray(theta0, jnp.float32),
                                q_scaler)
    zeros = jax.tree.map(jnp.zeros_like, params)
    state = GnepState(params=params, m=zeros, v=zeros,
                      step=jnp.zeros((), jnp.int32),
                      avg_norm=jnp.asarray(-1.0, jnp.float32))
    if os.path.exists(adam_path):
        z = np.load(adam_path)
        leaves, treedef = jax.tree.flatten(params)
        m = jax.tree.unflatten(
            treedef, [jnp.asarray(z[f"m{i}"]) for i in range(len(leaves))])
        v = jax.tree.unflatten(
            treedef, [jnp.asarray(z[f"v{i}"]) for i in range(len(leaves))])
        # exact f32 params from the sidecar (gnep.restart's %15.7e text is
        # the reference artifact but loses the last mantissa bit)
        if "p0" in z:
            params = jax.tree.unflatten(
                treedef,
                [jnp.asarray(z[f"p{i}"]) for i in range(len(leaves))])
        state = GnepState(params=params, m=m, v=v,
                          step=jnp.asarray(int(z["step"]), jnp.int32),
                          avg_norm=jnp.asarray(float(z["avg_norm"]),
                                               jnp.float32))
        epoch0 = int(z["epoch"])
        print(f"resuming Adam moments from {adam_path} (epoch {epoch0})")

    num_batches = len(batches)
    maximum_steps = cfg.epoch * num_batches
    weights = LossWeights(
        energy=cfg.lambda_e, force=cfg.lambda_f, virial=cfg.lambda_v
    )
    step_fn = jax.jit(make_gnep_step(model, weights, cfg.weight_decay))
    eval_fn = jax.jit(lambda p, b: loss_terms(model, p, b))
    # per-batch config / virial-config counts for Nc-weighted epoch means
    # (ref: fitness.cu:244-256)
    nc = [int(np.sum(np.asarray(b.weight) > 0)) for b in batches]
    nc_v = [int(np.sum(np.asarray(b.has_virial) > 0)) for b in batches]

    loss_path = os.path.join(workdir, "loss.out")
    # all epoch permutations drawn up front so a resumed run replays the
    # same batch order for the remaining epochs
    order_rng = np.random.default_rng(cfg.seed + 1)
    orders = [order_rng.permutation(num_batches) for _ in range(cfg.epoch)]
    t0 = time.time()
    for epoch in range(epoch0, cfg.epoch):
        # the reference shuffles batch order each epoch
        # (fitness.cu:217-220, random_device there; seeded here so resumed
        # runs are reproducible)
        order = orders[epoch]
        mse_e = mse_f = mse_v = 0.0
        count = count_v = 0
        for k, bi in enumerate(order):
            step = epoch * num_batches + k
            lr = gnep_lr(step, num_batches, maximum_steps, cfg)
            state, metrics = step_fn(state, batches[bi],
                                     jnp.asarray(lr, jnp.float32))
            mse_e += float(metrics["mse_e"]) * nc[bi]
            mse_f += float(metrics["mse_f"]) * nc[bi]
            mse_v += float(metrics["mse_v"]) * nc_v[bi]
            count += nc[bi]
            count_v += nc_v[bi]
        rmse_e = float(np.sqrt(mse_e / max(count, 1)))
        rmse_f = float(np.sqrt(mse_f / max(count, 1)))
        rmse_v = float(np.sqrt(mse_v / count_v)) if count_v else 0.0
        total = (cfg.lambda_e * rmse_e + cfg.lambda_f * rmse_f
                 + cfg.lambda_v * rmse_v)
        te = tf = tv = 0.0
        if test_batches:
            acc = np.zeros(3)
            w = np.zeros(3)
            for b in test_batches:
                me, mf, mv = (float(x) for x in eval_fn(state.params, b))
                ncb = int(np.sum(np.asarray(b.weight) > 0))
                ncv = int(np.sum(np.asarray(b.has_virial) > 0))
                acc += [me * ncb, mf * ncb, mv * ncv]
                w += [ncb, ncb, max(ncv, 0)]
            te = float(np.sqrt(acc[0] / max(w[0], 1)))
            tf = float(np.sqrt(acc[1] / max(w[1], 1)))
            tv = float(np.sqrt(acc[2] / w[2])) if w[2] else 0.0
        elapsed = time.time() - t0
        lr_now = gnep_lr(min((epoch + 1) * num_batches, maximum_steps - 1),
                         num_batches, maximum_steps, cfg)
        # the reference's exact 10-column row (fitness.cu:513-527)
        with open(loss_path, "a") as f:
            f.write(
                f"{epoch + 1:<8d}"
                + "".join(f"{x:<13.5f}" for x in
                          (total, rmse_e, rmse_f, rmse_v, te, tf, tv))
                + f"{lr_now:<15.7f}{elapsed:<13.5f}\n"
            )
        print(
            f"epoch {epoch + 1}/{cfg.epoch} loss {total:.5f} "
            f"rmse_e {rmse_e:.5f} rmse_f {rmse_f:.5f} "
            f"rmse_v {rmse_v:.5f} lr {lr_now:.2e}"
        )
        _checkpoint(workdir, model, state, q_scaler, epoch + 1,
                    restart_path, adam_path)
        t0 = time.time()
        if stop_after is not None and epoch + 1 >= stop_after:
            print(f"stopping after epoch {epoch + 1} (resume with the "
                  f"same command)")
            return
    print("wrote nep.txt")


def _checkpoint(workdir, model, state: GnepState, q_scaler, epoch,
                restart_path, adam_path):
    """Per-epoch outputs like the reference report_error: nep.txt +
    gnep.restart (parameters, %15.7e one per line, adam.cu:290-296) +
    the Adam-moment sidecar for exact resume."""
    theta = params_to_vector(model, state.params)
    write_nep_txt(os.path.join(workdir, "nep.txt"), model, theta,
                  np.asarray(q_scaler))
    with open(restart_path, "w") as f:
        for x in theta:
            f.write(f"{x:15.7e}\n")
    leaves_m = jax.tree.leaves(state.m)
    leaves_v = jax.tree.leaves(state.v)
    leaves_p = jax.tree.leaves(state.params)
    np.savez(
        adam_path,
        step=int(state.step), avg_norm=float(state.avg_norm), epoch=epoch,
        **{f"m{i}": np.asarray(x) for i, x in enumerate(leaves_m)},
        **{f"v{i}": np.asarray(x) for i, x in enumerate(leaves_v)},
        **{f"p{i}": np.asarray(x) for i, x in enumerate(leaves_p)},
    )


def params_to_vector(model, params) -> np.ndarray:
    """Inverse of params_from_vector (reference flat layout)."""
    t = model.num_types
    chunks = []
    for ty in range(t):
        chunks.append(np.asarray(params.w0[ty]).reshape(-1))
        chunks.append(np.asarray(params.b0[ty]).reshape(-1))
        chunks.append(np.asarray(params.w1[ty]).reshape(-1))
        if model.version == 5:
            chunks.append(np.asarray(params.b1_type[ty]).reshape(1))
    chunks.append(np.asarray(params.b1).reshape(1))
    t2 = t * t
    nr = (model.n_max_radial + 1) * (model.basis_size_radial + 1)
    na = (model.n_max_angular + 1) * (model.basis_size_angular + 1)
    c_rad = np.asarray(params.c_radial).reshape(t, t, nr).transpose(2, 0, 1)
    c_ang = np.asarray(params.c_angular).reshape(t, t, na).transpose(2, 0, 1)
    chunks.append(c_rad.reshape(-1))
    chunks.append(c_ang.reshape(-1))
    return np.concatenate(chunks)


if __name__ == "__main__":
    main()
