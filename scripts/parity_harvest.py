#!/usr/bin/env python
"""Summarize a (possibly truncated) BASELINE-config-5 parity run:
matched-generation table of our loss.out vs the reference's shipped
examples/nep_train/loss.out (ref: src/main_nep/fitness.cu:148-256 writes
the same columns).  SNES is stochastic, so parity = same loss basin at
matched generation count, not bit-identical curves.

Usage: python scripts/parity_harvest.py [workdir]   (default /tmp/nep_parity)
"""

import json
import sys

import numpy as np

REF = "/root/reference/examples/nep_train/loss.out"


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nep_parity"
    ours = np.atleast_2d(np.loadtxt(workdir + "/loss.out"))
    ref = np.atleast_2d(np.loadtxt(REF))
    gmax = int(ours[-1, 0])
    rows = []
    for g in (100, 500, 1000, 2000, 4000, 6000, 8000, 10000, 15000, 20000):
        if g > gmax:
            break
        o = ours[ours[:, 0] == g]
        r = ref[ref[:, 0] == g]
        if len(o) and len(r):
            rows.append((g, o[0][4], r[0][4], o[0][5], r[0][5]))
    print("| gen | RMSE_E ours (eV/at) | ref | RMSE_F ours (eV/A) | ref |")
    print("|---|---|---|---|---|")
    for g, oe, re_, of, rf in rows:
        print(f"| {g} | {oe:.5f} | {re_:.5f} | {of:.5f} | {rf:.5f} |")
    o_last = ours[-1]
    r_sel = ref[ref[:, 0] <= gmax]
    # run truncated before the reference's first logged generation: compare
    # against the reference's first row rather than crashing
    r_match = r_sel[-1] if len(r_sel) else ref[0]
    r_final = ref[-1]
    print(json.dumps({
        "metric": "trainer_parity_pbte",
        "generations_ours": gmax,
        "rmse_e_ours": float(o_last[4]), "rmse_f_ours": float(o_last[5]),
        "rmse_e_ref_at_match": float(r_match[4]),
        "rmse_f_ref_at_match": float(r_match[5]),
        "rmse_e_ref_final": float(r_final[4]),
        "rmse_f_ref_final": float(r_final[5]),
        "f_ratio_at_match": float(o_last[5] / r_match[5]),
    }))


if __name__ == "__main__":
    main()
