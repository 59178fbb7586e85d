"""Synthetic LJ-argon training set -> train.xyz + nep.in.

Labels come from the repo's own LJ implementation; the SNES trainer then
fits a tiny NEP to them (a self-contained end-to-end training demo).
Run:  python make_model.py && python -m gpumd_tpu.app.nep .
"""
import numpy as np

import jax.numpy as jnp

from gpumd_tpu.forcefield import ForceField
from gpumd_tpu.model import Box, make_state
from gpumd_tpu.potentials import LJ

rng = np.random.default_rng(0)
open("lj.txt", "w").write("lj 1 Ar\n1.032e-2 3.405 9.0\n")
pot = LJ.from_file("lj.txt")
lines = []
for _ in range(20):
    a0 = 5.26 * rng.uniform(0.97, 1.05)
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
    cells = np.array([[i, j, k] for i in range(2)
                      for j in range(2) for k in range(2)])
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    pos += rng.normal(0, 0.08, pos.shape)
    n = len(pos)
    box = Box.orthogonal([2 * a0] * 3)
    ff = ForceField.create([pot], box, n, mn=96)
    st = ff.compute(
        make_state(pos, np.full(n, 39.948), np.zeros(n, int), box)
    )
    e = float(jnp.sum(st.potential_energy * st.mask))
    f = np.asarray(st.force)
    lines.append(f"{n}\n")
    lat = " ".join(f"{x:g}" for x in np.diag([2 * a0] * 3).ravel())
    lines.append(
        f'Lattice="{lat}" energy={e:.8f} '
        'Properties=species:S:1:pos:R:3:force:R:3 pbc="T T T"\n'
    )
    for i in range(n):
        row = ["Ar"] + [f"{x:.8f}" for x in pos[i]] + \
              [f"{x:.8f}" for x in f[i]]
        lines.append(" ".join(row) + "\n")
open("train.xyz", "w").writelines(lines)
open("nep.in", "w").write("""type 1 Ar
cutoff 6 4
n_max 4 4
basis_size 4 4
l_max 4 0 0
neuron 10
population 24
generation 200
output_interval 20
""")
print("wrote train.xyz (20 configs) + nep.in; "
      "run: python -m gpumd_tpu.app.nep .")
