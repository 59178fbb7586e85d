"""The `nep` application: NEP training/prediction from nep.in + train.xyz.

    python -m gpumd_tpu.app.nep [workdir]

Reads nep.in (architecture + hyperparameters), train.xyz (+ optional
test.xyz), batches structures with static neighbor tensors, runs the SNES
trainer (whole population vmapped per device), and writes loss.out,
nep.txt, nep.restart — reference-compatible (ref: src/main_nep/main.cu).
Prediction mode (`prediction 1`) evaluates an existing nep.txt over the
training set and writes energy_train.out / force_train.out /
virial_train.out scatter files.
"""

from __future__ import annotations

import os
import sys
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from gpumd_tpu.io.nep_input import model_from_config, parse_nep_in
from gpumd_tpu.io.xyz import read_xyz_frames
from gpumd_tpu.potentials.nep.model import NEP
from gpumd_tpu.potentials.nep.params import params_from_vector
from gpumd_tpu.train.dataset import StructureBatch, batch_structures
from gpumd_tpu.train.nep_train import batched_forward
from gpumd_tpu.train.snes import SNESTrainer


def build_batches(
    frames, symbols, rc, batch_size, mn=200, log=print, model_type=0,
    charge_mode=0,
) -> List[StructureBatch]:
    """Split frames into batches of <= batch_size configs (ref: fitness.cu
    45-84: consecutive split), padding each batch to its own max_atoms."""
    batches = []
    for i in range(0, len(frames), batch_size):
        chunk = frames[i : i + batch_size]
        batches.append(
            batch_structures(chunk, symbols, rc=rc, mn=mn,
                             model_type=model_type,
                             charge_mode=charge_mode)
        )
    log(f"{len(frames)} configurations -> {len(batches)} batch(es)")
    return batches


def _write_descriptors(cfg, nep, batches, workdir):
    """descriptor.out in prediction mode: output_descriptor 1 writes the
    per-structure mean scaled descriptor, 2 the per-atom rows
    (ref: main_nep/nep.cu:711-740)."""
    path = os.path.join(workdir, "descriptor.out")
    with open(path, "a") as f:
        for batch in batches:
            def one(r12, idx, t, m):
                q, _ = NEP(nep.model, nep.params).raw_descriptors(
                    r12, t, t[idx]
                )
                return q * nep.params.q_scaler

            qs = jax.vmap(one)(batch.r12, batch.idx, batch.type, batch.mask)
            qs = np.asarray(qs)
            mask = np.asarray(batch.mask) > 0
            for c in range(batch.num_configs):
                qc = qs[c][mask[c]]
                if cfg.output_descriptor == 2:
                    for row in qc:
                        f.write(" ".join(f"{x:g}" for x in row) + "\n")
                else:
                    f.write(
                        " ".join(f"{x:g}" for x in qc.mean(axis=0)) + "\n"
                    )


def run_prediction(cfg, model, batches, workdir, log=print, tag="train"):
    nep = NEP.from_file(os.path.join(workdir, "nep.txt"))
    model = nep.model
    if cfg.output_descriptor and tag == "train":
        _write_descriptors(cfg, nep, batches, workdir)
        log("descriptor.out written")
    e_path = os.path.join(workdir, f"energy_{tag}.out")
    f_path = os.path.join(workdir, f"force_{tag}.out")
    v_path = os.path.join(workdir, f"virial_{tag}.out")
    with open(e_path, "w") as fe, open(f_path, "w") as ff, open(v_path, "w") as fv:
        for batch in batches:
            out = batched_forward(model, nep.params, batch)
            na = np.asarray(batch.n_atoms)
            e_pred = np.asarray(out.energy) / na
            e_ref = np.asarray(batch.energy_ref) / na
            for p, r in zip(e_pred, e_ref):
                fe.write(f"{p:15.7e}{r:15.7e}\n")
            fpred = np.asarray(out.force)
            fref = np.asarray(batch.force_ref)
            m = np.asarray(batch.mask) > 0
            for c in range(len(na)):
                for a in range(int(na[c])):
                    row = list(fpred[c, a]) + list(fref[c, a])
                    ff.write("".join(f"{x:15.7e}" for x in row) + "\n")
            vpred = np.asarray(out.virial) / na[:, None]
            vref = np.asarray(batch.virial_ref) / na[:, None]
            hv = np.asarray(batch.has_virial) > 0
            for c in range(len(na)):
                if hv[c]:
                    row = list(vpred[c]) + list(vref[c])
                    fv.write("".join(f"{x:15.7e}" for x in row) + "\n")
    log(f"prediction written: energy/force/virial_{tag}.out")


def main(argv=None):
    # bf16_3x matmuls throughout training: TPU's DEFAULT single-pass bf16
    # MXU puts ~0.4% relative noise on descriptor/ANN contractions — the
    # trainer's reported RMSEs and late-stage convergence need better (see
    # engine/nep_compact.py precision note; ref trains in full f32)
    jax.config.update("jax_default_matmul_precision", "high")
    argv = argv if argv is not None else sys.argv[1:]
    workdir = argv[0] if argv else "."
    cfg = parse_nep_in(os.path.join(workdir, "nep.in"))
    model = model_from_config(cfg)
    frames = read_xyz_frames(os.path.join(workdir, "train.xyz"))
    batches = build_batches(
        frames, cfg.symbols, rc=model.rc_radial_max,
        batch_size=cfg.batch_size, model_type=cfg.model_type,
        charge_mode=cfg.charge_mode,
    )
    if cfg.prediction:
        run_prediction(cfg, model, batches, workdir)
        test_path = os.path.join(workdir, "test.xyz")
        if os.path.exists(test_path):
            test_frames = read_xyz_frames(test_path)
            tb = build_batches(
                test_frames, cfg.symbols, rc=model.rc_radial_max,
                batch_size=cfg.batch_size, model_type=cfg.model_type,
                charge_mode=cfg.charge_mode,
            )
            run_prediction(cfg, model, tb, workdir, tag="test")
        return
    test_batches = []
    test_path = os.path.join(workdir, "test.xyz")
    if os.path.exists(test_path):
        test_frames = read_xyz_frames(test_path)
        test_batches = build_batches(
            test_frames, cfg.symbols, rc=model.rc_radial_max,
            batch_size=cfg.batch_size, model_type=cfg.model_type,
            charge_mode=cfg.charge_mode,
        )
    trainer = SNESTrainer(
        model, cfg, batches, workdir=workdir, test_batches=test_batches
    )
    # single-batch runs fuse output_interval generations per device call
    # (host round-trips dominate on remote accelerators)
    trainer.train_fused()


if __name__ == "__main__":
    main()
