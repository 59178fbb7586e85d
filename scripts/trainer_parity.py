#!/usr/bin/env python
"""BASELINE config 5: SNES trainer parity on the reference's PbTe example.

Runs the `nep` app on the reference's own example inputs
(/root/reference/examples/nep_train/: `type 2 Te Pb`, `generation 20000`,
everything else default) and compares the loss trajectory + final RMSEs
against the loss.out the reference ships with the example.

SNES is stochastic (different RNG streams), so "parity" is convergence to
the same loss basin, not bit-identical curves: the gate is final
energy/force RMSE within 1.5x of the reference's converged values
(E 0.41 meV/atom, F 39.9 meV/A), evaluated on the same training set.

Env: GPUMD_PARITY_GENS (default 20000), GPUMD_PARITY_WORKDIR.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np

REF_DIR = "/root/reference/examples/nep_train"


def main():
    gens = int(os.environ.get("GPUMD_PARITY_GENS", 20000))
    workdir = os.environ.get("GPUMD_PARITY_WORKDIR", "/tmp/nep_parity")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    os.makedirs(workdir, exist_ok=True)
    for f in ("train.xyz",):
        shutil.copy(os.path.join(REF_DIR, f), workdir)
    with open(os.path.join(REF_DIR, "nep.in")) as f:
        nep_in = f.read()
    if gens != 20000:
        nep_in = nep_in.replace("20000", str(gens))
    with open(os.path.join(workdir, "nep.in"), "w") as f:
        f.write(nep_in)
    if not os.environ.get("GPUMD_PARITY_RESUME"):
        for out in ("loss.out", "nep.txt", "nep.restart"):
            p = os.path.join(workdir, out)
            if os.path.exists(p):
                os.remove(p)

    env = dict(os.environ)
    # prepend (not replace): the image's PYTHONPATH carries the accelerator
    # plugin registration (/root/.axon_site)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    rc = subprocess.call(
        [sys.executable, "-m", "gpumd_tpu.app.nep", workdir],
        env=env, cwd=repo,
    )
    if rc != 0:
        raise SystemExit(f"trainer exited rc={rc}")

    ours = np.atleast_2d(np.loadtxt(os.path.join(workdir, "loss.out")))
    ref = np.atleast_2d(np.loadtxt(os.path.join(REF_DIR, "loss.out")))
    # columns: gen, total, L1, L2, rmse_E, rmse_F, rmse_V, (test cols)
    our_final = ours[-1]
    ref_final = ref[-1]
    e_ratio = our_final[4] / ref_final[4]
    f_ratio = our_final[5] / ref_final[5]
    print(json.dumps({
        "metric": "trainer_parity_pbte",
        "generations": int(ours[-1][0]),
        "rmse_e_ours_eV_per_atom": float(our_final[4]),
        "rmse_e_ref": float(ref_final[4]),
        "rmse_f_ours_eV_per_A": float(our_final[5]),
        "rmse_f_ref": float(ref_final[5]),
        "e_ratio": float(e_ratio),
        "f_ratio": float(f_ratio),
        "gate": "final E/F RMSE within 1.5x of reference",
        "pass": bool(e_ratio < 1.5 and f_ratio < 1.5),
    }))


if __name__ == "__main__":
    main()
