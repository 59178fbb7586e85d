"""SNES (separable natural evolution strategy) NEP trainer.

Reference: src/main_nep/snes.cu.  Differences in the TPU rebuild:
  * the WHOLE population is evaluated in one vmap over the batched forward
    (the reference round-robins individuals over GPUs, fitness.cu:158-199);
  * the per-element ranked update (snes.cu:252-293, 564-592) is fully
    vectorized: each variable class (per-type ANN block / c rows / global
    bias) is updated with the population ordering of ITS OWN type-resolved
    fitness, all types at once;
  * everything stays on device inside one jit per generation.

Matching reference conventions:
  utilities  u_k = max(0, ln(P/2+1) - ln(k+1)), normalized, minus 1/P
  eta_sigma  = (3 + ln(D/T)) / (5 sqrt(D/T)) / 2
  update     mu += sigma * sum_k u_k z_(k);  sigma *= exp(eta * sum u (z^2-1))
             (sigma capped at 1.0), rankings per variable type
  lambda auto: sqrt(D * 1e-6 / T)
  fitness[t] = L1[t] + L2[t] + lambda_e RMSE_e[t] + lambda_f RMSE_f[t]
               + lambda_v RMSE_v[t]   for t = 0..T-1 and t = T (global),
    where RMSE_*[t] pools configs containing element t
    (ref: dataset.cu get_rmse_energy/force/virial per-type arrays)
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


def type_of_variable_vector(model: NepModel) -> np.ndarray:
    """(D,) int: owning element of each trainable variable, T = shared/global
    (ref: snes.cu:252-293 find_type_of_variable).  Layout must mirror
    params_from_vector: per-type ANN blocks, global bias, then the c array
    basis-major with type-pair (t1*T+t2) minor — c rows belong to t1."""
    t = model.num_types
    neu, dim = model.neurons, model.dim
    if model.charge_mode:
        # per type w0/b0/w1e/w1q; then sqrt_eps_inf + b1 global
        per_type = (dim + 3) * neu
        tov = []
        for ty in range(t):
            tov.extend([ty] * per_type)
        tov.extend([t, t])
    else:
        per_type = (dim + 2) * neu + (1 if model.version == 5 else 0)
        tov = []
        num_ann = 2 if model.model_type == 2 else 1  # pol: second head
        for _ in range(num_ann):
            for ty in range(t):
                tov.extend([ty] * per_type)
            tov.append(t)  # global output bias
    t2 = t * t
    nr = (model.n_max_radial + 1) * (model.basis_size_radial + 1)
    na = (model.n_max_angular + 1) * (model.basis_size_angular + 1)
    for _ in range(nr + na):
        for t1 in range(t):
            tov.extend([t1] * t)
    out = np.asarray(tov, np.int32)
    assert out.shape[0] == num_trainable(model)
    return out


_FOUNDATION_TYPES = 89  # nep89 foundation model element count


def _element_index_89(z: int) -> int:
    """Foundation-model slot of atomic number z (ref: snes.cu:148-155:
    Po/At/Rn/Fr/Ra are absent from the 89-element foundation model)."""
    missing = (84, 85, 86, 87, 88)
    if z in missing or z < 1 or z > 94:
        return 0
    return z - 1 - sum(1 for m in missing if m < z)


def fine_tune_init(model: NepModel, cfg: NepTrainConfig):
    """(mu, sigma, q_scaler) bootstrapped from an 89-element foundation model
    (ref: snes.cu:144-238 for mu/sigma, parameters.cu:263-281 for q_scaler).

    Slices the user's elements' ANN blocks and (t1, t2) c rows out of the
    foundation nep.restart; descriptor sigmas are zeroed (frozen) unless
    fine_tune_descriptor.  The global-bias slot starts at (0, 0) as in the
    reference (its vectors are zero-initialized and the slot is skipped)."""
    nf = _FOUNDATION_TYPES
    per_ann = (model.dim + 2) * model.neurons + (1 if model.version == 5 else 0)
    num_ann = nf * per_ann + 1
    nr = (model.n_max_radial + 1) * (model.basis_size_radial + 1)
    na = (model.n_max_angular + 1) * (model.basis_size_angular + 1)
    num_tot = num_ann + nf * nf * (nr + na)
    arr = np.loadtxt(cfg.fine_tune_nep_restart)
    if arr.shape != (num_tot, 2):
        raise ValueError(
            f"foundation restart {cfg.fine_tune_nep_restart}: expected "
            f"{num_tot} rows x 2 cols for this architecture, got {arr.shape}"
        )
    rmu, rsig = arr[:, 0], arr[:, 1]
    d = num_trainable(model)
    t = model.num_types
    mu = np.zeros(d)
    sigma = np.zeros(d)
    cnt = 0
    for ty in range(t):
        ei = _element_index_89(model.atomic_numbers[ty])
        mu[cnt : cnt + per_ann] = rmu[ei * per_ann : (ei + 1) * per_ann]
        sigma[cnt : cnt + per_ann] = rsig[ei * per_ann : (ei + 1) * per_ann]
        cnt += per_ann
    cnt += 1  # global bias stays (0, 0)
    eidx = [_element_index_89(z) for z in model.atomic_numbers]
    for nk in range(nr + na):
        base = num_ann + nk * nf * nf
        for t1 in range(t):
            for t2 in range(t):
                src = base + eidx[t1] * nf + eidx[t2]
                mu[cnt] = rmu[src]
                sigma[cnt] = rsig[src] if cfg.fine_tune_descriptor else 0.0
                cnt += 1
    assert cnt == d
    q_scaler = read_q_scaler_from_nep_txt(
        cfg.fine_tune_nep_txt, model.dim, num_tot
    )
    return mu, sigma, q_scaler


def read_q_scaler_from_nep_txt(path: str, dim: int, num_params: int):
    """q_scaler block of a nep.txt: skip 7 header + num_params parameter
    lines, read dim scaler lines (ref: parameters.cu:274-281, 292-301)."""
    vals = []
    with open(path) as f:
        rows = [ln.split() for ln in f if ln.split()]
    for row in rows[7 + num_params : 7 + num_params + dim]:
        vals.append(float(row[0]))
    if len(vals) != dim:
        raise ValueError(f"{path}: expected {dim} q_scaler lines")
    return np.asarray(vals)


def per_type_rmses(model: NepModel, cfg: NepTrainConfig, out, batch,
                   use_weight: bool = True, do_shift: bool = False,
                   return_shift: bool = False):
    """Type-resolved (T+1,) RMSE arrays, reference pooling conventions
    (ref: dataset.cu:630-678 force, 892-951 energy, 998-1041 virial).

    t < T pools configs CONTAINING element t; t = T pools all.  Training
    weights (config weight^2, per-element type_weight, force_delta
    demotion, lambda_shear on shear virials) apply when use_weight.

    `do_shift` subtracts the energy_weight-weighted mean per-structure
    energy error before the energy RMSE (ref: dataset.cu:823-922
    gpu_get_energy_shift + do_shift in get_rmse_energy) — the reference's
    energy fitness is SHIFT-INVARIANT, so SNES never has to evolve the
    constant offset (it is absorbed into the elite's output bias at
    save time, fitness.cu:457).  Round 3 missed this, which is why our
    gen-100 RMSE_E trailed the reference 18x (VERDICT round-3 item 3)."""
    t = model.num_types
    dtype = out.energy.dtype
    na = jnp.maximum(batch.n_atoms.astype(dtype), 1.0)
    cw2 = batch.weight**2 if use_weight else jnp.ones_like(batch.weight)
    # has_type: (C, T+1) config-contains-element indicator
    onehot = jax.nn.one_hot(batch.type, t, dtype=dtype) * batch.mask[..., None]
    has_type = jnp.concatenate(
        [(jnp.sum(onehot, axis=1) > 0).astype(dtype),
         jnp.ones((batch.num_configs, 1), dtype)], axis=1,
    )  # (C, T+1)

    # energy: per-config ((E-Eref)/Na - shift)^2 * energy_weight
    de = (out.energy - batch.energy_ref) / na
    ew = batch.energy_weight
    shift = jnp.zeros((), dtype)
    if do_shift:
        shift = jnp.sum(de * ew) / jnp.maximum(jnp.sum(ew), 1e-12)
        de = de - shift
    err_e = ew * de * de
    num_e = jnp.einsum("c,ct->t", cw2 * err_e, has_type)
    cnt_e = jnp.maximum(jnp.einsum("c,ct->t", jnp.ones_like(err_e), has_type), 1.0)
    rmse_e = jnp.sqrt(num_e / cnt_e)

    # force: pooled atoms; type_weight^2 and force_delta demotion per atom
    df2 = jnp.sum((out.force - batch.force_ref) ** 2, axis=-1)  # (C, A)
    if use_weight:
        if cfg.type_weight and any(w != 1.0 for w in cfg.type_weight):
            tw = jnp.asarray(cfg.type_weight[:t], dtype)[batch.type]
            df2 = df2 * tw * tw
        if cfg.force_delta > 0.0:
            fmag = jnp.sqrt(jnp.sum(batch.force_ref**2, axis=-1))
            df2 = df2 * (cfg.force_delta / (cfg.force_delta + fmag))
    err_f = jnp.sum(df2 * batch.mask, axis=1)  # (C,)
    num_f = jnp.einsum("c,ct->t", cw2 * err_f, has_type)
    cnt_f = jnp.maximum(jnp.einsum("c,ct->t", na, has_type) * 3.0, 1.0)
    rmse_f = jnp.sqrt(num_f / cnt_f)

    # virial: 6 Voigt components per config, shear (d>=3) scaled
    if cfg.atomic_v and getattr(out, "avirial", None) is not None \
            and batch.has_avirial is not None:
        # per-ATOM tensorial comparison (ref: dataset.cu:766-830)
        nd = 3.0 if cfg.model_type == 1 else 6.0
        d_av = out.avirial - batch.avirial_ref
        if cfg.model_type == 1:
            d_av = d_av[..., :3]
        err_v = jnp.sum(
            d_av**2 * batch.mask[..., None], axis=(1, 2)
        ) * batch.has_avirial
        hv = has_type * batch.has_avirial[:, None]
        num_v = jnp.einsum("c,ct->t", cw2 * err_v, hv)
        cnt_v = jnp.maximum(jnp.einsum("c,ct->t", na, hv) * nd, 1e-12)
        rmse_v = jnp.sqrt(num_v / cnt_v)
    else:
        dv = (out.virial - batch.virial_ref) / na[:, None]
        sw = cfg.lambda_shear**2 if use_weight else 1.0
        err_v = (jnp.sum(dv[:, :3] ** 2, axis=1)
                 + sw * jnp.sum(dv[:, 3:] ** 2, axis=1)) * batch.has_virial
        hv = has_type * batch.has_virial[:, None]
        num_v = jnp.einsum("c,ct->t", cw2 * err_v, hv)
        cnt_v = jnp.maximum(
            jnp.einsum("c,ct->t", jnp.ones_like(err_v), hv) * 6.0, 1e-12
        )
        rmse_v = jnp.sqrt(num_v / cnt_v)

    # qNEP: total-charge + Born-effective-charge RMSEs, reference pooling
    # (ref: dataset.cu:1112-1191 — unweighted; charge counts 1 per config,
    # bec counts 9 per config with the error pre-divided by Na)
    if getattr(out, "qsum", None) is not None:
        dq = (out.qsum - batch.charge_ref) / na
        num_q = jnp.einsum("c,ct->t", dq * dq, has_type)
        cnt_q = jnp.maximum(
            jnp.einsum("c,ct->t", jnp.ones_like(dq), has_type), 1.0
        )
        rmse_q = jnp.sqrt(num_q / cnt_q)
        db2 = jnp.sum(
            (out.bec - batch.bec_ref) ** 2 * batch.mask[..., None],
            axis=(1, 2),
        ) / na  # (C,)
        hb = has_type * batch.has_bec[:, None]
        num_b = jnp.einsum("c,ct->t", db2, hb)
        cnt_b = jnp.maximum(
            jnp.einsum("c,ct->t", jnp.ones_like(db2), hb) * 9.0, 1e-12
        )
        rmse_b = jnp.sqrt(num_b / cnt_b)
    else:
        rmse_q = jnp.zeros((t + 1,), dtype)
        rmse_b = jnp.zeros((t + 1,), dtype)
    if return_shift:
        return rmse_e, rmse_f, rmse_v, rmse_q, rmse_b, shift
    return rmse_e, rmse_f, rmse_v, rmse_q, rmse_b


def compute_q_scaler(model: NepModel, theta, batches: List[StructureBatch]):
    """1/(max-min) per descriptor dim over the whole training set.

    theta rides as a jit ARGUMENT and the params build happens inside the
    trace: a params closure would embed device arrays as MLIR constants,
    whose value fetch (device->host at lowering) wedged through the axon
    tunnel (round-5 incident)."""
    theta = np.asarray(theta)
    qmax = np.full((model.dim,), -1e6, theta.dtype)
    qmin = np.full((model.dim,), 1e6, theta.dtype)

    @jax.jit
    def minmax(theta, batch, qmax, qmin):
        nep = NEP(model, params_from_vector(model, theta))

        def one(r12, idx, t, m):
            q, _ = nep.raw_descriptors(r12, t, t[idx])
            big = jnp.where(m[:, None] > 0, q, -1e6)
            small = jnp.where(m[:, None] > 0, q, 1e6)
            return big.max(axis=0), small.min(axis=0)

        hi, lo = jax.vmap(one)(batch.r12, batch.idx, batch.type, batch.mask)
        return jnp.maximum(qmax, hi.max(axis=0)), jnp.minimum(qmin, lo.min(axis=0))

    for b in batches:
        qmax, qmin = minmax(theta, b, qmax, qmin)
    return 1.0 / jnp.maximum(qmax - qmin, 1e-6)


def make_population_pieces(
    model: NepModel,
    cfg: NepTrainConfig,
    q_scaler,
    lambda_1: float,
    lambda_2: float,
):
    """Three jitted pieces of one SNES generation: sample / eval / update.

    Split so the trainer can evaluate the SAME population over several
    batches (use_full_batch combines per-batch RMSEs as a quadratic mean,
    ref: fitness.cu:202-256) before the ranked update."""
    d = num_trainable(model)
    pop = cfg.population_size
    t = model.num_types
    per_class = d / t
    eta_sigma = (3.0 + np.log(per_class)) / (5.0 * np.sqrt(per_class)) / 2.0
    # HOST constants on purpose: these are closed over by the trainer jits,
    # and device-array closures force a device-to-host VALUE fetch at
    # lowering time (see the q_scaler comment in NepTrainer.__init__)
    utility = np.asarray(_utilities(pop))
    tov = np.asarray(type_of_variable_vector(model))  # (D,) in 0..T
    # variable-class masks: rows 0..T-1 per-element, row T = everything
    vmask = np.concatenate(
        [np.eye(t + 1, dtype=np.float32)[tov][:, :t].T,
         np.ones((1, d), np.float32)], axis=0,
    )  # (T+1, D)
    nv_class = np.concatenate(
        [np.full((t,), d / t, np.float32), np.asarray([float(d)])]
    ).astype(np.float32)

    def sample(state: SNESState):
        key, sub = jax.random.split(state.key)
        z = jax.random.normal(sub, (pop, d), state.mu.dtype)
        thetas = state.mu[None, :] + state.sigma[None, :] * z
        return key, z, thetas

    def evaluate(thetas, batch: StructureBatch):
        def one(theta):
            params = params_from_vector(model, theta, q_scaler)
            out = batched_forward(model, params, batch)
            # shift-invariant energy fitness (ref: fitness.cu:178-180
            # passes do_shift=true for every population evaluation)
            return per_type_rmses(model, cfg, out, batch, do_shift=True)

        return jax.vmap(one)(thetas)  # five (pop, T+1) arrays

    def update(state: SNESState, key, z, thetas, rmse_e, rmse_f, rmse_v,
               rmse_q, rmse_b):
        # per-class L1/L2 regularization (ref: snes.cu:462-533)
        cost_l1 = lambda_1 * (jnp.abs(thetas) @ vmask.T) / nv_class
        cost_l2 = lambda_2 * jnp.sqrt((thetas**2 @ vmask.T) / nv_class)
        fitness = (
            cost_l1
            + cost_l2
            + cfg.lambda_e * rmse_e
            + cfg.lambda_f * rmse_f
            + cfg.lambda_v * rmse_v
            + cfg.lambda_q * rmse_q
            + cfg.lambda_z * rmse_b
        )  # (pop, T+1)
        order = jnp.argsort(fitness, axis=0)  # (pop, T+1) per-class ranking
        # ranked natural gradients per class, then per-variable selection
        z_by_class = z[order.T]  # (T+1, pop, D)
        g_mu = jnp.einsum("p,tpd->td", utility, z_by_class)
        g_sig = jnp.einsum("p,tpd->td", utility, z_by_class**2 - 1.0)
        grad_mu = jnp.take_along_axis(g_mu, tov[None, :], axis=0)[0]
        grad_sigma = jnp.take_along_axis(g_sig, tov[None, :], axis=0)[0]
        mu = (state.mu + state.sigma * grad_mu).astype(state.mu.dtype)
        sigma = jnp.minimum(
            state.sigma * jnp.exp(eta_sigma * grad_sigma), 1.0
        ).astype(state.sigma.dtype)
        best = order[0, t]  # global-fitness best (ref: snes.cu:370)
        metrics = {
            "fitness": fitness[best, t],
            "l1": cost_l1[best, t],
            "l2": cost_l2[best, t],
            "rmse_e": rmse_e[best, t],
            "rmse_f": rmse_f[best, t],
            "rmse_v": rmse_v[best, t],
            "rmse_q": rmse_q[best, t],
            "rmse_b": rmse_b[best, t],
            "best_theta": thetas[best],
        }
        return (
            SNESState(mu=mu, sigma=sigma, key=key, generation=state.generation + 1),
            metrics,
        )

    return sample, evaluate, update


def make_generation_step(
    model: NepModel,
    cfg: NepTrainConfig,
    q_scaler,
    lambda_1: float,
    lambda_2: float,
):
    """(state, batch) -> (state, metrics) for one SNES generation
    (single-batch convenience wrapper around make_population_pieces)."""
    sample, evaluate, update = make_population_pieces(
        model, cfg, q_scaler, lambda_1, lambda_2
    )

    def step(state: SNESState, batch: StructureBatch):
        key, z, thetas = sample(state)
        re, rf, rv, rq, rb = evaluate(thetas, batch)
        return update(state, key, z, thetas, re, rf, rv, rq, rb)

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
        mesh=None,
    ):
        # population-parallel over a device mesh: the vmapped population
        # axis is sharded, batches replicated (the TPU analog of the
        # reference's one-individual-per-GPU round-robin,
        # ref: fitness.cu:158-199); population is rounded up to a
        # multiple of the device count like parameters.cu:132-140.
        if mesh is None and len(jax.devices()) > 1:
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()), ("pop",))
        self.mesh = mesh
        if mesh is not None:
            nd = mesh.devices.size
            pop = cfg.population_size
            if pop % nd:
                import dataclasses as _dc

                cfg = _dc.replace(
                    cfg, population_size=pop + nd - pop % nd
                )
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
        q_scaler = None
        # generation numbering continues across restarts: a resumed run
        # appends to loss.out from where the checkpointed run stopped (the
        # reference reloads nep.restart the same way, snes.cu:106-137; its
        # loss.out also just keeps appending)
        self.gen_offset = 0
        loss_path = os.path.join(workdir, "loss.out")
        if os.path.exists(restart) and os.path.exists(loss_path):
            try:
                rows = np.atleast_2d(np.loadtxt(loss_path))
                if rows.size:
                    self.gen_offset = int(rows[-1][0])
            except Exception:
                pass
        if os.path.exists(restart):
            arr = np.loadtxt(restart)
            mu, sigma = arr[:, 0], arr[:, 1]
        elif cfg.fine_tune:
            mu, sigma, q_scaler = fine_tune_init(model, cfg)
        else:
            mu = (rng.random(d) - 0.5) * 2.0 * cfg.initial_para
            sigma = np.full(d, cfg.sigma0)
        if q_scaler is None and cfg.import_q_scaler:
            q_scaler = read_q_scaler_from_nep_txt(
                os.path.join(workdir, "nep.txt"), model.dim, d
            )
        key = jax.random.PRNGKey(cfg.seed)
        if self.gen_offset:
            # resumed runs branch the sampling stream instead of replaying
            # the generation-0 keys
            key = jax.random.fold_in(key, self.gen_offset)
        self.state = SNESState(
            mu=jnp.asarray(mu, dtype),
            sigma=jnp.asarray(sigma, dtype),
            key=key,
            generation=jnp.asarray(self.gen_offset, jnp.int32),
        )
        # q_scaler from a CONSTANT initial_para parameter vector over the
        # full training set (ref: fitness.cu:162-171 evaluates a
        # dummy_solution filled with para.initial_para at generation 0 with
        # calculate_q_scaler=true) — NOT from the random mu, whose c-value
        # cancellations give a different descriptor range and mis-condition
        # the ANN inputs.
        # q_scaler is CLOSED OVER by every trainer jit: keep it a HOST
        # array.  Device-array closures embed as MLIR constants, and the
        # lowering fetches their VALUE device-to-host — through the axon
        # tunnel that D2H wedged a 20k-generation run (round-5 incident:
        # faulthandler showed ir_constant -> array._value in
        # futex_do_wait).  Same reason theta passes as np.full below.
        self.q_scaler = (
            np.asarray(q_scaler, dtype) if q_scaler is not None
            else np.asarray(compute_q_scaler(
                model, np.full((d,), cfg.initial_para, dtype), batches))
        )
        sample, evaluate, update = make_population_pieces(
            model, cfg, self.q_scaler, self.lambda_1, self.lambda_2
        )
        self._sample = jax.jit(sample)
        self._eval = jax.jit(evaluate)
        self._update = jax.jit(update)
        self.best_theta = np.asarray(self.state.mu)
        from gpumd_tpu.potentials.nep.params import global_bias_index

        self._b1_idx = global_bias_index(model)

        def _theta_rmses(theta, batch, do_shift):
            params = params_from_vector(model, theta, self.q_scaler)
            out = batched_forward(model, params, batch)
            # reporting uses unweighted global RMSEs (ref: fitness.cu:443-470;
            # the train row is shift-corrected, the test row evaluates the
            # bias-corrected elite with no further shift)
            e, f, v, _, _, shift = per_type_rmses(
                model, cfg, out, batch, use_weight=False, do_shift=do_shift,
                return_shift=True,
            )
            return e[-1], f[-1], v[-1], shift

        self._theta_rmses_shift = jax.jit(
            lambda th, b: _theta_rmses(th, b, True))
        self._theta_rmses = jax.jit(
            lambda th, b: _theta_rmses(th, b, False)[:3])

    def _write_loss_row(self, row):
        """Append one loss.out row in the reference's exact column layout
        (fitness.cu:497-578): NEP models print 10 columns
        %-8d %-11.5f x3 %-13.5f x6 with test columns always present (zeros
        when no test set); qNEP prints 14 columns at %-9.5f; tensorial
        (dipole/polarizability) prints gen, total, L1, L2, v_train, v_test."""
        gen = int(row[0])
        vals = [float(x) for x in row[1:]]
        if self.model.charge_mode:
            # row: total,l1,l2,e,f,v,q,b [,te,tf,tv]; test q/b not evaluated
            # without a test set -> zeros like the reference
            test = vals[8:11] + [0.0] * (3 - len(vals[8:11]))
            cols = vals[:8] + test + [0.0, 0.0]
            line = f"{gen:<8d}" + "".join(f"{v:<9.5f}" for v in cols)
        elif self.model.model_type in (1, 2):
            # tensorial: the dipole/polarizability RMSE rides the v slot
            v_tr = vals[5]
            v_te = vals[8] if len(vals) > 8 else 0.0
            line = (
                f"{gen:<8d}" + "".join(f"{v:<11.5f}" for v in vals[:3])
                + f"{v_tr:<13.5f}{v_te:<13.5f}"
            )
        else:
            train3 = vals[3:6]
            test3 = vals[6:9] + [0.0] * (3 - len(vals[6:9]))
            line = (
                f"{gen:<8d}" + "".join(f"{v:<11.5f}" for v in vals[:3])
                + "".join(f"{v:<13.5f}" for v in train3 + test3)
            )
        with open(os.path.join(self.workdir, "loss.out"), "a") as f:
            f.write(line + "\n")

    def _report_elite(self, best_theta, batch):
        """Reference report_error semantics (fitness.cu:430-470): re-evaluate
        the elite unweighted + shift-corrected on the train batch, absorb
        the shift into the global output bias (so written nep.txt predicts
        unbiased energies), then test RMSEs with the corrected elite."""
        theta = jnp.asarray(best_theta)
        e, f, v, shift = self._theta_rmses_shift(theta, batch)
        if self.model.model_type in (0, 3):
            theta = theta.at[self._b1_idx].add(shift)
        self.best_theta = np.asarray(theta)
        row = [float(e), float(f), float(v)]
        if self.test_batches:
            te, tf_, tv = self._theta_rmses(theta, self.test_batches[0])
            row += [float(te), float(tf_), float(tv)]
        return row

    def train_fused(self, generations: Optional[int] = None, log=print):
        """Single-batch training with `output_interval` generations fused
        into one jitted lax.scan — removes the per-generation host
        round-trip, which dominates on a remote accelerator (the reference
        has no analog: its generation loop is host-driven, snes.cu:354).
        Falls back to train() when multiple batches are configured."""
        if len(self.batches) != 1 or self.cfg.use_full_batch:
            return self.train(generations, log=log)
        gens = (generations or self.cfg.maximum_generation) - self.gen_offset
        if gens <= 0:
            log(f"nothing to do: loss.out already at generation "
                f"{self.gen_offset}")
            return self.state
        report = max(1, min(self.cfg.output_interval, gens))
        # dispatch granularity: one device RPC per `chunk` generations.
        # GPUMD_TRAIN_CHUNK bounds it below the report interval — a wedged
        # axon RPC costs at most `chunk` generations of progress (round-5
        # incident: 100-gen ~45 s dispatches wedged in futex_do_wait; the
        # MD engine's GPUMD_SCAN_BLOCK plays the same role).  Clamped to a
        # DIVISOR of the report interval so rows land exactly on
        # output_interval boundaries.
        chunk = max(1, min(
            int(os.environ.get("GPUMD_TRAIN_CHUNK", report)), report))
        while report % chunk:
            chunk -= 1
        batch = self.batches[0]
        gen_step = make_generation_step(
            self.model, self.cfg, self.q_scaler, self.lambda_1,
            self.lambda_2,
        )

        # batch must be a traced ARGUMENT: closing over it bakes the whole
        # training set in as XLA constants and compile-time constant-folding
        # then evaluates descriptor-sized tensors over the full dataset
        # (round-3: 80+ min compiles on the 25-config PbTe example)
        @jax.jit
        def run_chunk(state, batch):
            def body(st, _):
                st, metrics = gen_step(st, batch)
                return st, metrics
            return jax.lax.scan(body, state, length=chunk)

        t0 = time.time()
        done = 0
        while done < gens:
            self.state, metrics = run_chunk(self.state, batch)
            done += chunk
            if done % report and done < gens:
                continue
            last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            row = [
                self.gen_offset + done,
                float(last["fitness"]), float(last["l1"]),
                float(last["l2"]),
            ] + self._report_elite(np.asarray(last["best_theta"]), batch)
            self._write_loss_row(row)
            log(
                f"gen {done}: fitness {row[1]:.5f} rmse_e {row[4]:.5f} "
                f"rmse_f {row[5]:.5f} rmse_v {row[6]:.5f} "
                f"({time.time() - t0:.0f}s)"
            )
            if done % 100 < chunk:
                self.save_restart()
            if done % self.cfg.save_potential < chunk:
                self.save_potential()
        self.save_restart()
        self.save_potential()
        return self.state

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
        gens = (generations or self.cfg.maximum_generation) - self.gen_offset
        if gens <= 0:
            log(f"nothing to do: loss.out already at generation "
                f"{self.gen_offset}")
            return self.state
        t0 = time.time()
        shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        for g in range(gens):
            gi = g % len(self.batches)
            key, z, thetas = self._sample(self.state)
            if shard is not None:
                thetas = jax.device_put(thetas, shard)
                z = jax.device_put(z, shard)
            rmses = self._eval(thetas, self.batches[gi])
            if self.cfg.use_full_batch and len(self.batches) > 1:
                # quadratic mean of per-batch RMSEs (ref: fitness.cu:202-256)
                sums = [r**2 for r in rmses]
                for j, b in enumerate(self.batches):
                    if j == gi:
                        continue
                    extra = self._eval(thetas, b)
                    sums = [s + r**2 for s, r in zip(sums, extra)]
                nb = len(self.batches)
                rmses = tuple(jnp.sqrt(s / nb) for s in sums)
            self.state, metrics = self._update(
                self.state, key, z, thetas, *rmses
            )
            if (g + 1) % self.cfg.output_interval == 0 or g == gens - 1:
                row = [
                    self.gen_offset + g + 1,
                    float(metrics["fitness"]),
                    float(metrics["l1"]),
                    float(metrics["l2"]),
                ]
                if self.model.charge_mode:
                    # charge mode keeps the population metrics + charge/BEC
                    # columns (ref: fitness.cu:530-536); no bias absorption
                    self.best_theta = np.asarray(metrics["best_theta"])
                    row += [
                        float(metrics["rmse_e"]), float(metrics["rmse_f"]),
                        float(metrics["rmse_v"]),
                        float(metrics["rmse_q"]), float(metrics["rmse_b"])
                    ]
                    if self.test_batches:
                        te, tf_, tv = self._theta_rmses(
                            jnp.asarray(self.best_theta),
                            self.test_batches[0],
                        )
                        row += [float(te), float(tf_), float(tv)]
                else:
                    row += self._report_elite(
                        np.asarray(metrics["best_theta"]),
                        self.batches[gi],
                    )
                self._write_loss_row(row)
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
