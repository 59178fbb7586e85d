"""Differentiable NEP training: batched forward, loss, Adam step.

This is the TPU-native analog of the reference's gradient trainer `gnep`
(ref: src/main_gnep/: analytic dE/dtheta + dF/dtheta kernels, Adam with
decoupled weight decay adam.cuh:25-58, cosine LR fitness.cu:317-328).

Where the reference hand-writes ~3.5k lines of parameter-gradient kernels
(gradients.cuh), here force errors are differentiated straight through the
r12->energy vjp with reverse-over-reverse autodiff, and XLA fuses the lot.
The same batched forward serves SNES fitness evaluation (main_nep) —
SNES vmaps it over the population axis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import NepModel, NepParams
from gpumd_tpu.train.dataset import StructureBatch


class ConfigOutput(NamedTuple):
    energy: jnp.ndarray  # (C,) total energy
    force: jnp.ndarray  # (C, A, 3)
    virial: jnp.ndarray  # (C, 6) Voigt xx yy zz xy yz zx
    # qNEP extras (None for plain models)
    qsum: Optional[jnp.ndarray] = None  # (C,) raw total predicted charge
    bec: Optional[jnp.ndarray] = None  # (C, A, 9) Born effective charges
    # per-atom tensorial observable for atomic_v TNEP training (C, A, 6)
    avirial: Optional[jnp.ndarray] = None


def batched_forward(
    model: NepModel, params: NepParams, batch: StructureBatch
) -> ConfigOutput:
    """Energy/forces/virial for every config in the batch (vmapped).

    For TNEP models the tensorial observable rides the virial slots like
    the reference (dipole -> first 3 Voigt components, polarizability ->
    all 6; ref: tnep.cu, structure.cu:351-404)."""
    if model.model_type in (1, 2):
        return _batched_forward_tnep(model, params, batch)
    if model.charge_mode:
        return _batched_forward_charge(model, params, batch)

    def one_config(r12, idx, nbr_mask, type_, mask):
        t2 = type_[idx]

        def e_fn(r12_):
            return NEP(model, params).per_atom_energy(r12_, type_, t2)

        e_atom, vjp = jax.vjp(e_fn, r12)
        (p,) = vjp(mask)
        e_total = jnp.sum(e_atom * mask)
        # forces: scatter form (configs are small; scatter is fine here)
        a = p.shape[0]
        own = jnp.sum(p, axis=1)
        recv = jax.ops.segment_sum(
            p.reshape(-1, 3), idx.reshape(-1), num_segments=a
        )
        force = (own - recv) * mask[:, None]
        # total virial: W = sum_pairs -r12 (x) p
        rm = r12 * nbr_mask[..., None]
        w = -jnp.einsum("amx,amy->xy", rm, p)
        voigt = jnp.stack([w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[1, 2], w[2, 0]])
        return e_total, force, voigt

    e, f, v = jax.vmap(one_config)(
        batch.r12, batch.idx, batch.nbr_mask, batch.type, batch.mask
    )
    return ConfigOutput(energy=e, force=f, virial=v)


def _batched_forward_tnep(
    model: NepModel, params: NepParams, batch: StructureBatch
) -> ConfigOutput:
    """TNEP dipole/polarizability forward: the observable lands in the
    virial slots (dipole -> 0:3; polarizability -> Voigt 6 incl. the
    second-head diagonal; ref: tnep.cu find_descriptors/apply_ann).

    The per-atom `avirial` output (atomic_v training, ref:
    dataset.cu:766-830 get_rmse_avirial) attributes each bond term to the
    atom whose neighbor row produced it — the decomposition sums exactly
    to the global observable."""
    nep = NEP(model, params)

    def one_config(r12, idx, nbr_mask, type_, mask):
        t2 = type_[idx]
        e_atom, vjp = jax.vjp(
            lambda r: nep.per_atom_energy(r, type_, t2), r12
        )
        (p,) = vjp(mask)
        if model.model_type == 1:
            # mu_a = - sum_pairs |r12|^2 p_a (both pair directions listed)
            r2 = jnp.sum(r12 * r12, axis=-1) * nbr_mask
            mu = -jnp.einsum("nm,nma->a", r2, p)
            voigt = jnp.concatenate([mu, jnp.zeros((3,), mu.dtype)])
            # per-atom attribution (own neighbor row; sums to the total)
            mu_atom = -jnp.einsum("nm,nma->na", r2, p)
            av = jnp.concatenate(
                [mu_atom, jnp.zeros_like(mu_atom)], axis=-1
            )
        else:
            rm = r12 * nbr_mask[..., None]
            w = -jnp.einsum("amx,amy->xy", rm, p)
            w = 0.5 * (w + w.T)
            dtype = r12.dtype
            q, _ = nep.raw_descriptors(r12, type_, t2)
            q = q * params.q_scaler.astype(dtype)
            x1 = jnp.tanh(
                jnp.einsum("pd,tud->ptu", q, params.w0_pol.astype(dtype))
                - params.b0_pol.astype(dtype)[None]
            )
            f_t = jnp.einsum("ptu,tu->pt", x1, params.w1_pol.astype(dtype))
            f_pol = jnp.take_along_axis(f_t, type_[:, None], axis=1)[:, 0]
            f_pol = (f_pol - params.b1_pol.astype(dtype)) * mask
            diag = jnp.sum(f_pol)
            voigt = jnp.stack([
                w[0, 0] + diag, w[1, 1] + diag, w[2, 2] + diag,
                w[0, 1], w[1, 2], w[2, 0],
            ])
            # per-atom attribution: own bond row + own diagonal head
            wa = -jnp.einsum("amx,amy->axy", rm, p)
            wa = 0.5 * (wa + jnp.swapaxes(wa, 1, 2))
            av = jnp.stack([
                wa[:, 0, 0] + f_pol, wa[:, 1, 1] + f_pol,
                wa[:, 2, 2] + f_pol,
                wa[:, 0, 1], wa[:, 1, 2], wa[:, 2, 0],
            ], axis=-1)
        zero_e = jnp.zeros((), r12.dtype)
        zero_f = jnp.zeros_like(r12[:, 0, :])
        return zero_e, zero_f, voigt, av * mask[:, None]

    e, f, v, av = jax.vmap(one_config)(
        batch.r12, batch.idx, batch.nbr_mask, batch.type, batch.mask
    )
    return ConfigOutput(energy=e, force=f, virial=v, avirial=av)


def _batched_forward_charge(
    model: NepModel, params: NepParams, batch: StructureBatch
) -> ConfigOutput:
    """qNEP training forward: two-head ANN -> charge-neutralized real +
    reciprocal electrostatics, forces/virial by autodiff, raw charge sums
    and Born effective charges for the lambda_q / lambda_z losses
    (ref: main_nep/nep_charge.cu find_force_charge_real_space:930-1005,
    find_k_and_G:1020-1086, zero_total_charge:1088-1123,
    find_bec_*:356-630)."""
    from gpumd_tpu.potentials.nep.charge import two_head_energy_charge
    from gpumd_tpu.units import K_C, PI

    alpha = PI / model.rc_radial_max
    rc = model.rc_radial_max
    sqrt_eps = params.sqrt_epsilon_inf

    def one_config(r12, idx, nbr_mask, type_, mask, pos, qref, kvec, gk):
        t2 = type_[idx]
        dtype = r12.dtype
        na = jnp.maximum(jnp.sum(mask), 1.0)

        def total_energy(r12_, pos_):
            e_nep, q_raw = two_head_energy_charge(
                model, params, params.w1_charge, r12_, type_, t2
            )
            q_raw = q_raw * mask
            # shift so the config total matches the reference total charge
            q = (q_raw + (qref - jnp.sum(q_raw)) / na) * mask
            if model.charge_mode == 1:
                d = jnp.sqrt(jnp.maximum(jnp.sum(r12_**2, axis=-1), 1e-12))
                qq = q[:, None] * q[idx]
                erfc_r = jax.scipy.special.erfc(alpha * d) / d
                pair = jnp.where(
                    (d < rc) & (nbr_mask > 0), qq * erfc_r, 0.0
                )
                e_real = K_C * (
                    0.5 * jnp.sum(pair, axis=-1)
                    - (alpha / jnp.sqrt(PI)) * q * q
                )
            else:
                e_real = jnp.zeros_like(q)
            kr = pos_ @ kvec.T  # (A, K)
            s_re = jnp.sum((q * mask)[:, None] * jnp.cos(kr), axis=0)
            s_im = -jnp.sum((q * mask)[:, None] * jnp.sin(kr), axis=0)
            e_rec = K_C * jnp.sum(gk * (s_re**2 + s_im**2))
            e_tot = jnp.sum((e_nep + e_real) * mask) + e_rec
            return e_tot, (jnp.sum(q_raw), q, s_re, s_im)

        (e_tot, (qsum, q, s_re, s_im)), grads = jax.value_and_grad(
            total_energy, argnums=(0, 1), has_aux=True
        )(r12, pos)
        p, dpos = grads
        a = p.shape[0]
        own = jnp.sum(p, axis=1)
        recv = jax.ops.segment_sum(
            p.reshape(-1, 3), idx.reshape(-1), num_segments=a
        )
        force = (own - recv - dpos) * mask[:, None]
        rm = r12 * nbr_mask[..., None]
        w = -jnp.einsum("amx,amy->xy", rm, p)
        # analytic reciprocal virial (ref: ewald.cu find_virial_reciprocal;
        # same expression as NEPCharge.compute_with_state)
        ksq = jnp.maximum(jnp.sum(kvec * kvec, axis=1), 1e-12)
        pref = K_C * gk * (s_re**2 + s_im**2)
        eye = jnp.eye(3, dtype=dtype)
        w_rec = jnp.sum(pref) * eye - jnp.einsum(
            "k,ka,kb->ab",
            pref * 2.0 * (1.0 / ksq + 1.0 / (4.0 * alpha**2)),
            kvec, kvec,
        )
        w = w + w_rec
        voigt = jnp.stack(
            [w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[1, 2], w[2, 0]]
        )

        # Born effective charges, bond-centered gauge (ref: find_bec_*)
        y = jax.grad(
            lambda r: jnp.sum(
                two_head_energy_charge(
                    model, params, params.w1_charge, r, type_, t2
                )[1] * mask
            )
        )(r12)
        b = 0.5 * r12[..., :, None] * y[..., None, :] * nbr_mask[..., None, None]
        own_b = jnp.sum(b, axis=1)
        recv_b = jax.ops.segment_sum(
            b.reshape(-1, 3, 3), idx.reshape(-1), num_segments=a
        )
        bec = (own_b - recv_b + q[:, None, None] * eye) * sqrt_eps
        return e_tot, force, voigt, qsum, bec.reshape(a, 9)

    e, f, v, qs, bec = jax.vmap(one_config)(
        batch.r12, batch.idx, batch.nbr_mask, batch.type, batch.mask,
        batch.position, batch.charge_ref, batch.kvec, batch.gk,
    )
    return ConfigOutput(energy=e, force=f, virial=v, qsum=qs, bec=bec)


class LossWeights(NamedTuple):
    energy: float = 1.0  # lambda_e (nep.in defaults, parameters.cu)
    force: float = 1.0  # lambda_f
    virial: float = 0.1  # lambda_v


def loss_terms(
    model: NepModel, params: NepParams, batch: StructureBatch
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-term MSEs (energy per atom, force components, virial per atom),
    weighted by per-config weight tags (ref: dataset.cu get_rmse_*)."""
    out = batched_forward(model, params, batch)
    na = jnp.maximum(batch.n_atoms.astype(out.energy.dtype), 1.0)
    cw = batch.weight

    de = (out.energy - batch.energy_ref) / na
    mse_e = jnp.sum(cw * batch.energy_weight * de * de) / jnp.sum(cw)

    df = (out.force - batch.force_ref) * batch.mask[..., None]
    per_cfg_f = jnp.sum(df * df, axis=(1, 2)) / (3.0 * na)
    mse_f = jnp.sum(cw * per_cfg_f) / jnp.sum(cw)

    dv = (out.virial - batch.virial_ref) / na[:, None]
    per_cfg_v = jnp.mean(dv * dv, axis=1) * batch.has_virial
    denom = jnp.maximum(jnp.sum(cw * batch.has_virial), 1e-12)
    mse_v = jnp.sum(cw * per_cfg_v) / denom

    return mse_e, mse_f, mse_v


def loss_fn(model, params, batch, weights: LossWeights):
    mse_e, mse_f, mse_v = loss_terms(model, params, batch)
    total = (
        weights.energy * mse_e + weights.force * mse_f + weights.virial * mse_v
    )
    return total, (jnp.sqrt(mse_e), jnp.sqrt(mse_f), jnp.sqrt(mse_v))


class TrainState(NamedTuple):
    params: NepParams
    opt_state: tuple
    step: jnp.ndarray


def make_train_step(model: NepModel, weights: LossWeights, optimizer):
    """Returns a jittable (state, batch) -> (state, metrics) Adam/any-optax
    step with gradients through energies AND forces (second-order AD)."""

    def train_step(state: TrainState, batch: StructureBatch):
        (total, rmses), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, weights), has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        import optax

        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": total, "rmse_e": rmses[0], "rmse_f": rmses[1], "rmse_v": rmses[2]},
        )

    return train_step


def cosine_lr(step, total_steps, lr_max=1e-3, lr_min=1e-5, warmup=0):
    """Cosine schedule with optional warmup (ref: gnep fitness.cu:317-328)."""
    warm = jnp.minimum(step / jnp.maximum(warmup, 1), 1.0) if warmup else 1.0
    t = jnp.clip(step / total_steps, 0.0, 1.0)
    return warm * (lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(jnp.pi * t)))


class GnepState(NamedTuple):
    """gnep optimizer state: Adam moments + the gradient-norm EMA used by
    the reference's adaptive clipping (ref: main_gnep/adam.cu:132-161).
    Checkpointable: gnep.restart carries params (reference format) and a
    sidecar npz carries (m, v, step, avg_norm) so a resumed run continues
    bit-identically — stronger than the reference, whose gnep.restart
    stores parameters only (adam.cu:225-245)."""

    params: NepParams
    m: NepParams
    v: NepParams
    step: jnp.ndarray  # Adam bias-correction counter
    avg_norm: jnp.ndarray  # gradient-norm EMA (-1 = unset)


def make_gnep_step(model: NepModel, weights: LossWeights,
                   weight_decay: float):
    """(state, batch, lr) -> (state, metrics): the reference gnep update —
    global-norm gradient clipping to min(EMA, 10) (adam.cu:132-161), Adam
    moments (adam.cu:37-52), bias-corrected decoupled-weight-decay step
    (adam.cu:53-72).  lr arrives per call (host-computed warmup/cosine
    schedule, fitness.cu:317-371)."""
    beta1, beta2, eps = 0.9, 0.999, 1e-8

    def gnep_step(state: GnepState, batch: StructureBatch, lr):
        (total, rmses), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, weights), has_aux=True
        )(state.params)
        leaves = jax.tree.leaves(grads)
        norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float64) ** 2)
                            if g.dtype == jnp.float64
                            else jnp.sum(g * g) for g in leaves))
        avg = jnp.where(state.avg_norm < 0, norm,
                        0.9 * state.avg_norm + 0.1 * norm)
        max_norm = jnp.minimum(avg, 10.0)
        scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-12), 1.0)
        grads = jax.tree.map(lambda g: g * scale, grads)
        m = jax.tree.map(lambda mm, g: beta1 * mm + (1 - beta1) * g,
                         state.m, grads)
        v = jax.tree.map(lambda vv, g: beta2 * vv + (1 - beta2) * g * g,
                         state.v, grads)
        bc1 = 1.0 - beta1 ** (state.step + 1).astype(jnp.float32)
        bc2 = 1.0 - beta2 ** (state.step + 1).astype(jnp.float32)
        params = jax.tree.map(
            lambda p, mm, vv: p - lr * (
                (mm / bc1) / (jnp.sqrt(vv / bc2) + eps) + weight_decay * p
            ),
            state.params, m, v,
        )
        new_state = GnepState(params=params, m=m, v=v,
                              step=state.step + 1, avg_norm=avg)
        return new_state, {
            "loss": total, "rmse_e": rmses[0], "rmse_f": rmses[1],
            "rmse_v": rmses[2],
            "mse_e": rmses[0] ** 2, "mse_f": rmses[1] ** 2,
            "mse_v": rmses[2] ** 2,
        }

    return gnep_step


def gnep_lr(step: int, num_batches: int, maximum_steps: int, cfg):
    """Host-side LR schedule, the reference's update_learning_rate_cos /
    _cos_restart verbatim (fitness.cu:317-371)."""
    import math

    start_lr, stop_lr = cfg.start_lr, cfg.stop_lr
    if not cfg.lr_restart_enable:
        warmup_steps = 1 * num_batches
        if step < warmup_steps:
            return stop_lr + (step / warmup_steps) * (start_lr - stop_lr)
        progress = (step - warmup_steps) / max(
            maximum_steps - warmup_steps, 1)
        smooth = 0.5 * (1.0 + math.cos(math.pi * progress))
        return stop_lr + (start_lr - stop_lr) * smooth
    warmup_steps = cfg.lr_warmup_epochs * num_batches
    if step < warmup_steps:
        return stop_lr + (step / warmup_steps) * (start_lr - stop_lr)
    initial_period = cfg.lr_restart_initial_period_epochs * num_batches
    pf = cfg.lr_restart_period_factor
    df = cfg.lr_restart_decay_factor
    steps_since = step - warmup_steps
    total = maximum_steps - warmup_steps
    cycle = 0
    cycle_start = 0
    cycle_len = initial_period
    cum = 0
    while cum + cycle_len <= steps_since:
        cum += cycle_len
        cycle_start = cum
        cycle += 1
        cycle_len = int(initial_period * pf ** cycle)
    if cum + cycle_len > total:
        cycle_len = max(total - cum, 1)
    progress = (steps_since - cycle_start) / cycle_len
    cycle_max = max(start_lr * df ** cycle, stop_lr)
    smooth = 0.5 * (1.0 + math.cos(math.pi * progress))
    return stop_lr + (cycle_max - stop_lr) * smooth
