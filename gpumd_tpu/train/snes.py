"""SNES (separable natural evolution strategy) NEP trainer.

Reference: src/main_nep/snes.cu.  Differences in the TPU rebuild:
  * the WHOLE population is evaluated in one vmap over the batched forward
    (the reference round-robins individuals over GPUs, fitness.cu:158-199);
  * rank-based updates use the total-fitness ordering for every variable
    class (the reference additionally re-ranks per element block with
    type-resolved RMSEs; planned refinement);
  * everything stays on device inside one jit per generation.

Matching reference conventions:
  utilities  u_k = max(0, ln(P/2+1) - ln(k+1)), normalized, minus 1/P
  eta_sigma  = (3 + ln(D/T)) / (5 sqrt(D/T)) / 2
  update     mu += sigma * sum_k u_k z_(k);  sigma *= exp(eta * sum u (z^2-1))
             (sigma capped at 1.0)
  lambda auto: sqrt(D * 1e-6 / T)
  fitness    = L1 + L2 + lambda_e RMSE_e + lambda_f RMSE_f + lambda_v RMSE_v
  q_scaler   = 1 / (max q - min q) over the training set
"""

from __future__ import annotations

import os
import time
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.io.nep_input import NepTrainConfig
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import (
    NepModel,
    num_trainable,
    params_from_vector,
    write_nep_txt,
)
from gpumd_tpu.train.dataset import StructureBatch
from gpumd_tpu.train.nep_train import batched_forward


class SNESState(NamedTuple):
    mu: jnp.ndarray  # (D,)
    sigma: jnp.ndarray  # (D,)
    key: jnp.ndarray
    generation: jnp.ndarray


def _utilities(population_size: int) -> np.ndarray:
    k = np.arange(population_size)
    u = np.maximum(0.0, np.log(population_size * 0.5 + 1.0) - np.log(k + 1.0))
    return (u / u.sum() - 1.0 / population_size).astype(np.float32)


def compute_q_scaler(model: NepModel, theta, batches: List[StructureBatch]):
    """1/(max-min) per descriptor dim over the whole training set."""
    nep = NEP(model, params_from_vector(model, theta))
    qmax = jnp.full((model.dim,), -1e6)
    qmin = jnp.full((model.dim,), 1e6)

    @jax.jit
    def minmax(batch, qmax, qmin):
        def one(r12, idx, t, m):
            q, _ = nep.raw_descriptors(r12, t, t[idx])
            big = jnp.where(m[:, None] > 0, q, -1e6)
            small = jnp.where(m[:, None] > 0, q, 1e6)
            return big.max(axis=0), small.min(axis=0)

        hi, lo = jax.vmap(one)(batch.r12, batch.idx, batch.type, batch.mask)
        return jnp.maximum(qmax, hi.max(axis=0)), jnp.minimum(qmin, lo.min(axis=0))

    for b in batches:
        qmax, qmin = minmax(b, qmax, qmin)
    return 1.0 / jnp.maximum(qmax - qmin, 1e-6)


def make_generation_step(
    model: NepModel,
    cfg: NepTrainConfig,
    q_scaler,
    lambda_1: float,
    lambda_2: float,
):
    """(state, batch) -> (state, metrics) for one SNES generation."""
    d = num_trainable(model)
    pop = cfg.population_size
    t = model.num_types
    per_class = d / t
    eta_sigma = (3.0 + np.log(per_class)) / (5.0 * np.sqrt(per_class)) / 2.0
    utility = jnp.asarray(_utilities(pop))

    def individual_rmses(theta, batch):
        params = params_from_vector(model, theta, q_scaler)
        out = batched_forward(model, params, batch)
        na = jnp.maximum(batch.n_atoms.astype(out.energy.dtype), 1.0)
        cw = batch.weight
        de = (out.energy - batch.energy_ref) / na
        mse_e = jnp.sum(cw * batch.energy_weight * de * de) / jnp.sum(cw)
        df = (out.force - batch.force_ref) * batch.mask[..., None]
        per_f = jnp.sum(df * df, axis=(1, 2)) / (3.0 * na)
        mse_f = jnp.sum(cw * per_f) / jnp.sum(cw)
        dv = (out.virial - batch.virial_ref) / na[:, None]
        per_v = jnp.mean(dv * dv, axis=1) * batch.has_virial
        denom = jnp.maximum(jnp.sum(cw * batch.has_virial), 1e-12)
        mse_v = jnp.sum(cw * per_v) / denom
        return jnp.sqrt(mse_e), jnp.sqrt(mse_f), jnp.sqrt(mse_v)

    def step(state: SNESState, batch: StructureBatch):
        key, sub = jax.random.split(state.key)
        z = jax.random.normal(sub, (pop, d), state.mu.dtype)
        thetas = state.mu[None, :] + state.sigma[None, :] * z

        rmse_e, rmse_f, rmse_v = jax.vmap(
            individual_rmses, in_axes=(0, None)
        )(thetas, batch)
        cost_l1 = lambda_1 * jnp.mean(jnp.abs(thetas), axis=1)
        cost_l2 = lambda_2 * jnp.sqrt(jnp.mean(thetas * thetas, axis=1))
        fitness = (
            cost_l1
            + cost_l2
            + cfg.lambda_e * rmse_e
            + cfg.lambda_f * rmse_f
            + cfg.lambda_v * rmse_v
        )
        order = jnp.argsort(fitness)
        z_sorted = z[order]
        grad_mu = jnp.einsum("p,pd->d", utility, z_sorted)
        grad_sigma = jnp.einsum("p,pd->d", utility, z_sorted**2 - 1.0)
        mu = state.mu + state.sigma * grad_mu
        sigma = jnp.minimum(state.sigma * jnp.exp(eta_sigma * grad_sigma), 1.0)
        best = order[0]
        metrics = {
            "fitness": fitness[best],
            "l1": cost_l1[best],
            "l2": cost_l2[best],
            "rmse_e": rmse_e[best],
            "rmse_f": rmse_f[best],
            "rmse_v": rmse_v[best],
            "best_theta": thetas[best],
        }
        return (
            SNESState(mu=mu, sigma=sigma, key=key, generation=state.generation + 1),
            metrics,
        )

    return step


class SNESTrainer:
    """Training loop driver: batches round-robin per generation, loss.out,
    nep.txt / nep.restart checkpoints (ref: snes.cu:295-422)."""

    def __init__(
        self,
        model: NepModel,
        cfg: NepTrainConfig,
        batches: List[StructureBatch],
        workdir: str = ".",
        dtype=jnp.float32,
        test_batches: List[StructureBatch] = (),
    ):
        self.model = model
        self.cfg = cfg
        self.batches = batches
        self.test_batches = list(test_batches)
        self.workdir = workdir
        d = num_trainable(model)
        self.d = d
        lam_auto = float(np.sqrt(d * 1.0e-6 / model.num_types))
        self.lambda_1 = cfg.lambda_1 if cfg.lambda_1 >= 0 else lam_auto
        self.lambda_2 = cfg.lambda_2 if cfg.lambda_2 >= 0 else lam_auto

        rng = np.random.default_rng(cfg.seed)
        restart = os.path.join(workdir, "nep.restart")
        if os.path.exists(restart):
            arr = np.loadtxt(restart)
            mu, sigma = arr[:, 0], arr[:, 1]
        else:
            mu = (rng.random(d) - 0.5) * 2.0 * cfg.initial_para
            sigma = np.full(d, cfg.sigma0)
        self.state = SNESState(
            mu=jnp.asarray(mu, dtype),
            sigma=jnp.asarray(sigma, dtype),
            key=jax.random.PRNGKey(cfg.seed),
            generation=jnp.zeros((), jnp.int32),
        )
        self.q_scaler = compute_q_scaler(model, self.state.mu, batches)
        self._step = jax.jit(
            make_generation_step(
                model, cfg, self.q_scaler, self.lambda_1, self.lambda_2
            )
        )
        self.best_theta = np.asarray(self.state.mu)

        def _theta_rmses(theta, batch):
            from gpumd_tpu.train.nep_train import batched_forward
            from gpumd_tpu.potentials.nep.params import params_from_vector

            params = params_from_vector(model, theta, self.q_scaler)
            out = batched_forward(model, params, batch)
            na = jnp.maximum(batch.n_atoms.astype(out.energy.dtype), 1.0)
            de = (out.energy - batch.energy_ref) / na
            df = (out.force - batch.force_ref) * batch.mask[..., None]
            per_f = jnp.sum(df * df, axis=(1, 2)) / (3.0 * na)
            dv = (out.virial - batch.virial_ref) / na[:, None]
            per_v = jnp.mean(dv * dv, axis=1) * batch.has_virial
            denom = jnp.maximum(jnp.sum(batch.has_virial), 1e-12)
            return (
                jnp.sqrt(jnp.mean(de * de)),
                jnp.sqrt(jnp.mean(per_f)),
                jnp.sqrt(jnp.sum(per_v) / denom),
            )

        self._theta_rmses = jax.jit(_theta_rmses)

    def save_restart(self):
        arr = np.stack(
            [np.asarray(self.state.mu), np.asarray(self.state.sigma)], axis=1
        )
        np.savetxt(os.path.join(self.workdir, "nep.restart"), arr, fmt="%15.7e")

    def save_potential(self, filename="nep.txt"):
        write_nep_txt(
            os.path.join(self.workdir, filename),
            self.model,
            self.best_theta,
            np.asarray(self.q_scaler),
        )

    def train(self, generations: Optional[int] = None, log=print):
        gens = generations or self.cfg.maximum_generation
        loss_path = os.path.join(self.workdir, "loss.out")
        t0 = time.time()
        for g in range(gens):
            batch = self.batches[g % len(self.batches)]
            self.state, metrics = self._step(self.state, batch)
            if (g + 1) % self.cfg.output_interval == 0 or g == gens - 1:
                self.best_theta = np.asarray(metrics["best_theta"])
                row = [
                    g + 1,
                    float(metrics["fitness"]),
                    float(metrics["l1"]),
                    float(metrics["l2"]),
                    float(metrics["rmse_e"]),
                    float(metrics["rmse_f"]),
                    float(metrics["rmse_v"]),
                ]
                if self.test_batches:
                    te, tf_, tv = self._theta_rmses(
                        jnp.asarray(self.best_theta), self.test_batches[0]
                    )
                    row += [float(te), float(tf_), float(tv)]
                with open(loss_path, "a") as f:
                    f.write(
                        f"{row[0]:<8d}"
                        + "".join(f"{x:15.7e}" for x in row[1:])
                        + "\n"
                    )
                log(
                    f"gen {g + 1}: fitness {row[1]:.5f} rmse_e {row[4]:.5f} "
                    f"rmse_f {row[5]:.5f} rmse_v {row[6]:.5f} "
                    f"({time.time() - t0:.0f}s)"
                )
            if (g + 1) % 100 == 0:
                self.save_restart()
            if (g + 1) % self.cfg.save_potential == 0:
                self.save_potential()
        self.save_restart()
        self.save_potential()
        return self.state
