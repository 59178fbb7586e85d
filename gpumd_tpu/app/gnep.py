"""The `gnep` application: gradient-descent NEP training.

    python -m gpumd_tpu.app.gnep [workdir]

TPU-native analog of the reference gnep trainer (ref: src/main_gnep/):
Adam with decoupled weight decay (adam.cuh:25-58) and a cosine LR
schedule from start_lr to stop_lr (fitness.cu:317-328), driven by an
epoch x batch loop (fitness.cu:212-280).  Where the reference hand-writes
~3.5k lines of analytic parameter-gradient kernels (gradients.cuh), the
loss here is differentiated straight through the batched forward
(reverse-over-reverse autodiff for force errors) and XLA fuses the lot.

Reads nep.in (epoch / start_lr / stop_lr / weight_decay + the shared
architecture keywords) and train.xyz; writes loss.out rows
(step, lr, loss, rmse_e, rmse_f, rmse_v) and a final nep.txt.
"""

from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gpumd_tpu.io.nep_input import model_from_config, parse_nep_in
from gpumd_tpu.io.xyz import read_xyz_frames
from gpumd_tpu.potentials.nep.params import (
    num_trainable, params_from_vector, write_nep_txt,
)
from gpumd_tpu.train.nep_train import (
    LossWeights, TrainState, batched_forward, loss_fn, make_train_step,
)
from gpumd_tpu.train.snes import compute_q_scaler


def main(argv=None):
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

    d = num_trainable(model)
    rng = np.random.default_rng(cfg.seed)
    theta0 = (rng.random(d) - 0.5) * 0.2
    q_scaler = compute_q_scaler(model, jnp.asarray(theta0, jnp.float32),
                                batches)
    params = params_from_vector(model, jnp.asarray(theta0, jnp.float32),
                                q_scaler)

    total_steps = cfg.epoch * len(batches)
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.start_lr, decay_steps=max(total_steps, 1),
        alpha=cfg.stop_lr / cfg.start_lr,
    )
    optimizer = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    weights = LossWeights(
        energy=cfg.lambda_e, force=cfg.lambda_f, virial=cfg.lambda_v
    )
    step_fn = jax.jit(make_train_step(model, weights, optimizer))
    state = TrainState(
        params=params, opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    loss_path = os.path.join(workdir, "loss.out")
    step = 0
    for ep in range(cfg.epoch):
        for batch in batches:
            state, metrics = step_fn(state, batch)
            step += 1
            if step % cfg.output_interval == 0 or step == total_steps:
                lr = float(schedule(step))
                row = [step, lr, float(metrics["loss"]),
                       float(metrics["rmse_e"]), float(metrics["rmse_f"]),
                       float(metrics["rmse_v"])]
                with open(loss_path, "a") as f:
                    f.write(
                        f"{row[0]:<8d}"
                        + "".join(f"{x:15.7e}" for x in row[1:]) + "\n"
                    )
                print(
                    f"step {step}/{total_steps} lr {lr:.2e} "
                    f"loss {row[2]:.5f} rmse_e {row[3]:.5f} "
                    f"rmse_f {row[4]:.5f}"
                )
    # flatten params back to the reference vector layout for nep.txt
    theta = params_to_vector(model, state.params)
    write_nep_txt(
        os.path.join(workdir, "nep.txt"), model, theta,
        np.asarray(q_scaler),
    )
    print("wrote nep.txt")


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
