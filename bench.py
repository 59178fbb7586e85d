#!/usr/bin/env python
"""Headline benchmark: NEP MD throughput (atom-step/s) on one TPU chip.

Mirrors BASELINE.json config 3 (NEP PbTe at 1M atoms): rocksalt PbTe with a
NEP4 model of the reference's PbTe architecture (type 2, cutoff 8/4,
n_max 6 6, basis 6 6, l_max 4+q222, 30 neurons) with synthesized weights —
throughput is independent of the trained values.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 1e8 atom-step/s/chip (BASELINE.md).

Env knobs: GPUMD_BENCH_N (atoms, default ~1M), GPUMD_BENCH_STEPS.
"""

import json
import os
import sys
import time

import jax

# GPUMD_BENCH_CPU=1: force the CPU backend (the image force-appends the
# accelerator platform; plain env vars cannot override it) — used for
# smoke-testing the benchmark harness without a chip.
if os.environ.get("GPUMD_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA:TPU compiles of the fused MD scan take
# minutes at large N; cache them across bench invocations.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def build_pbte(n_cells_x, n_cells_y, n_cells_z, a0=6.57):
    """Rocksalt PbTe supercell: 8 atoms per cubic cell."""
    base = np.array(
        [
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],  # Pb
            [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5],  # Te
        ]
    )
    types_cell = np.array([1, 1, 1, 1, 0, 0, 0, 0])  # 0=Te, 1=Pb (file order Te Pb)
    cells = np.stack(
        np.meshgrid(
            np.arange(n_cells_x), np.arange(n_cells_y), np.arange(n_cells_z),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3)
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    types = np.tile(types_cell, len(cells))
    lengths = np.array([n_cells_x, n_cells_y, n_cells_z]) * a0
    return pos, types, lengths


def run_once(target_n, n_steps, engine="dense"):
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)

    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(8.0, 8.0), rc_angular=(4.0, 4.0),
        mn_radial=92, mn_angular=16, n_max_radial=6, n_max_angular=6,
        basis_size_radial=6, basis_size_angular=6, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=30,
    )
    nep = NEP(model=model, params=random_params(model, seed=1))

    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, 300.0, seed=3)
    dt = 1.0 / TIME_UNIT_CONVERSION

    if engine == "dense":
        # fused cell-grid engine (engine/dense_md.py): the TPU hot path
        from gpumd_tpu.engine.dense_md import DenseNEPMD

        skin = float(os.environ.get("GPUMD_BENCH_SKIN", 1.5))
        md = DenseNEPMD(nep, box, n, position=pos, skin=skin)
        # bake banded-gather bands: init_carry must run EAGERLY once (under
        # jit the band measurement no-ops on tracers) BEFORE the step/warm
        # closures trace, so the kernels compile with the measured bands
        md.init_carry(state)
        # Steady-state measurement: warm a carry (init rebuild + first
        # force), then time the scan alone.  The init rebuild amortizes
        # over the full production run — the reference's atom*step/s is
        # likewise dominated by steady-state steps (run.cu:324-326) —
        # while mid-run skin rebins, when displacement triggers them,
        # stay inside the timed block.
        ens = NVE()
        step = md.make_step(ens, dt)
        warm = jax.jit(
            lambda s: (lambda c: (c._replace(
                state=md.compute(c.state, c.idx)), ens.init(c.state)))(
                    md.init_carry(s))
        )
        run_block = jax.jit(
            lambda c, a: jax.lax.scan(step, (c, a), length=n_steps)[0]
        )
        carry0, aux0 = warm(state)
        carry, _ = run_block(carry0, aux0)  # compile + warmup
        jax.block_until_ready(carry.state.position)
        t0 = time.time()
        carry, _ = run_block(carry0, aux0)
        # force a real host sync (block_until_ready alone can be unreliable
        # through the axon tunnel)
        ok = bool(jnp.isfinite(carry.state.position).all())
        wall = time.time() - t0
        if not ok or bool(carry.overflow):
            raise RuntimeError("dense benchmark invalid (overflow/non-finite)")
        return n, n_steps, wall

    from gpumd_tpu.forcefield import ForceField
    from gpumd_tpu.integrate.run import make_md_step

    ff = ForceField.create([nep], box, n, mn=112, skin=1.0, per_atom_virial=False)
    step = make_md_step(ff, NVE(), dt, observer=lambda s: 0)

    @jax.jit
    def run_block(state):
        cache = ff.refresh_cache(state)
        (state, _, cache), _ = jax.lax.scan(
            step, (state, (), cache), length=n_steps
        )
        return state

    s1 = run_block(state)  # compile + warmup
    jax.block_until_ready(s1.position)

    t0 = time.time()
    s2 = run_block(state)
    ok = bool(jnp.isfinite(s2.position).all() & jnp.isfinite(s2.velocity).all())
    wall = time.time() - t0

    if not ok:
        raise RuntimeError("benchmark trajectory went non-finite")
    return n, n_steps, wall


def run_npt(target_n, n_steps):
    """BASELINE config 3 as specified: NEP PbTe MD under NPT on the compact
    fast path (ref: src/main_gpumd/run.cu:252-318 runs NEP under every
    ensemble through the one production path; ensemble_ber.cu:95-150).
    The dense engine's fractional-coordinate rebuild criterion keeps the
    static grid plan valid while the barostat rescales the cell
    (engine/dense_md.py)."""
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.integrate.ensembles.npt import NPTBerendsen
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(8.0, 8.0), rc_angular=(4.0, 4.0),
        mn_radial=92, mn_angular=16, n_max_radial=6, n_max_angular=6,
        basis_size_radial=6, basis_size_angular=6, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=30,
    )
    nep = NEP(model=model, params=random_params(model, seed=1))
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, 300.0, seed=3)
    dt = 1.0 / TIME_UNIT_CONVERSION

    skin = float(os.environ.get("GPUMD_BENCH_SKIN", 1.5))
    md = DenseNEPMD(nep, box, n, position=pos, skin=skin)
    md.init_carry(state)  # eager once: bake banded-gather bands (run_once)
    # PbTe-like coupling: bulk modulus ~40 GPa, tau_p 1 ps (reference's
    # npt_ber defaults, src/integrate/ensemble_ber.cu)
    ens = NPTBerendsen(
        t0=300.0, target_pressure=(0.0, 0.0, 0.0),
        elastic_modulus=(40.0, 40.0, 40.0), tau_p=1000.0,
    )
    step = md.make_step(ens, dt)
    warm = jax.jit(
        lambda s: (lambda c: (c._replace(
            state=md.compute(c.state, c.idx)), ens.init(c.state)))(
                md.init_carry(s))
    )
    run_block = jax.jit(
        lambda c, a: jax.lax.scan(step, (c, a), length=n_steps)[0]
    )
    carry0, aux0 = warm(state)
    carry, _ = run_block(carry0, aux0)
    jax.block_until_ready(carry.state.position)
    t0 = time.time()
    carry, _ = run_block(carry0, aux0)
    ok = bool(jnp.isfinite(carry.state.position).all())
    wall = time.time() - t0
    if not ok or bool(carry.overflow):
        raise RuntimeError("npt benchmark invalid (overflow/non-finite)")
    return n, n_steps, wall


def run_hnemd(target_n, n_steps):
    """BASELINE config 4 at scale: HNEMD heat-transport MD on the compact
    fast path — per-atom virial ON, homogeneous driving force, per-step
    heat-current observer reduced on device (the configuration the
    reference's graphene-kappa benchmark exercises,
    ref: src/measure/hnemd_kappa.cu + compute_heat.cu:18-29)."""
    from gpumd_tpu.engine.dense_md import DenseNEPMD
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.nep.model import NEP
    from gpumd_tpu.potentials.nep.params import NepModel, random_params
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    nc = max(2, round((target_n / 8) ** (1 / 3)))
    pos, types, lengths = build_pbte(nc, nc, nc)
    n = len(pos)
    model = NepModel(
        version=4, model_type=0, num_types=2, symbols=("Te", "Pb"),
        atomic_numbers=(52, 82), rc_radial=(8.0, 8.0), rc_angular=(4.0, 4.0),
        mn_radial=92, mn_angular=16, n_max_radial=6, n_max_angular=6,
        basis_size_radial=6, basis_size_angular=6, l_max=4,
        has_q=(1, 0, 0, 0, 0, 0), neurons=30,
    )
    nep = NEP(model=model, params=random_params(model, seed=1))
    box = Box.orthogonal(lengths)
    state = make_state(pos, np.where(types == 1, 207.2, 127.6), types, box)
    state = initialize_velocity(state, 300.0, seed=3)
    dt = 1.0 / TIME_UNIT_CONVERSION

    md = DenseNEPMD(nep, box, n, position=pos,
                    skin=float(os.environ.get("GPUMD_BENCH_SKIN", 1.5)),
                    per_atom_virial=True)
    md.hnemd_fe = (1.0e-4, 0.0, 0.0)  # A^-1, typical kappa driving
    md.init_carry(state)  # eager once: bake banded-gather bands (run_once)

    def observer(s):
        return jnp.sum(s.heat_current * s.mask[:, None], axis=0)

    def run(s):
        carry = md.init_carry(s)
        carry = carry._replace(state=md.compute(carry.state, carry.idx))
        aux = NVE().init(carry.state)
        step = md.make_step(NVE(), dt, observer=observer)
        (carry, aux), js = jax.lax.scan(step, (carry, aux), length=n_steps)
        return carry, js

    run_block = jax.jit(run)
    carry, js = run_block(state)
    jax.block_until_ready(carry.state.position)
    t0 = time.time()
    carry, js = run_block(state)
    ok = bool(jnp.isfinite(js).all())
    wall = time.time() - t0
    if not ok or bool(carry.overflow):
        raise RuntimeError("hnemd benchmark invalid (overflow/non-finite)")
    return n, n_steps, wall


def run_tersoff(target_n, n_steps):
    """BASELINE config 2: Tersoff silicon MD throughput on the compact
    engine (engine/tersoff_compact.py); GPUMD_BENCH_ENGINE=list falls back
    to the XLA list path."""
    from gpumd_tpu.engine.tersoff_compact import CompactTersoffMD
    from gpumd_tpu.forcefield import ForceField
    from gpumd_tpu.integrate.ensembles.nve import NVE
    from gpumd_tpu.integrate.run import make_md_step
    from gpumd_tpu.integrate.velocity import initialize_velocity
    from gpumd_tpu.model.box import Box
    from gpumd_tpu.model.state import make_state
    from gpumd_tpu.potentials.tersoff import Tersoff1989
    from gpumd_tpu.units import TIME_UNIT_CONVERSION

    a0 = 5.431
    nc = max(2, round((target_n / 8) ** (1 / 3)))
    base = np.array(
        [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
         [.25, .25, .25], [.75, .75, .25], [.75, .25, .75], [.25, .75, .75]]
    )
    cells = np.stack(
        np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    pos = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a0
    n = len(pos)
    pot = Tersoff1989.from_file(
        "/root/reference/potentials/tersoff/Si_Tersoff_1989.txt"
    )
    box = Box.orthogonal([nc * a0] * 3)
    state = make_state(pos, np.full(n, 28.085), np.zeros(n, int), box)
    state = initialize_velocity(state, 300.0, seed=3)
    dt = 1.0 / TIME_UNIT_CONVERSION

    if os.environ.get("GPUMD_BENCH_ENGINE", "compact") != "list":
        skin = float(os.environ.get("GPUMD_BENCH_SKIN", 1.0))
        md = CompactTersoffMD(pot, box, n, position=pos, skin=skin)
        # steady-state scan from a warmed carry (see run_once)
        ens = NVE()
        step = md.make_step(ens, dt)
        warm = jax.jit(
            lambda s: (lambda c: (c._replace(
                state=md.compute(c.state, c.idx)), ens.init(c.state)))(
                    md.init_carry(s))
        )
        run_block = jax.jit(
            lambda c, a: jax.lax.scan(step, (c, a), length=n_steps)[0]
        )
        carry0, aux0 = warm(state)
        carry, _ = run_block(carry0, aux0)
        jax.block_until_ready(carry.state.position)
        t0 = time.time()
        carry, _ = run_block(carry0, aux0)
        ok = bool(jnp.isfinite(carry.state.position).all())
        wall = time.time() - t0
        if not ok or bool(carry.overflow):
            raise RuntimeError("tersoff compact benchmark invalid")
        return n, n_steps, wall

    ff = ForceField.create([pot], box, n, mn=24, skin=1.0,
                           per_atom_virial=False)
    step = make_md_step(ff, NVE(), dt, observer=lambda s: 0)

    @jax.jit
    def run_block(state):
        cache = ff.refresh_cache(state)
        (state, _, cache), _ = jax.lax.scan(
            step, (state, (), cache), length=n_steps
        )
        return state

    s1 = run_block(state)
    jax.block_until_ready(s1.position)
    t0 = time.time()
    s2 = run_block(state)
    ok = bool(jnp.isfinite(s2.position).all())
    wall = time.time() - t0
    if not ok:
        raise RuntimeError("tersoff benchmark went non-finite")
    return n, n_steps, wall


def main():
    # BASELINE.json config 3: NEP PbTe at 1M atoms
    target_n = int(os.environ.get("GPUMD_BENCH_N", 1_000_000))
    n_steps = int(os.environ.get("GPUMD_BENCH_STEPS", 100))
    engine = os.environ.get("GPUMD_BENCH_ENGINE", "dense")
    mode = os.environ.get("GPUMD_BENCH_MODE", "nep")
    if mode == "npt":
        # BASELINE config 3 as written: NEP PbTe under NPT
        n, n_steps, wall = run_npt(target_n, n_steps)
        value = n * n_steps / wall
        print(json.dumps({
            "metric": "nep_pbte_npt_md_throughput", "value": value,
            "unit": "atom_step_per_s_per_chip", "vs_baseline": value / 1e8,
        }))
        print(f"# N={n} steps={n_steps} wall={wall:.2f}s", file=sys.stderr)
        return
    if mode == "hnemd":
        n, n_steps, wall = run_hnemd(target_n, n_steps)
        value = n * n_steps / wall
        print(json.dumps({
            "metric": "nep_hnemd_md_throughput", "value": value,
            "unit": "atom_step_per_s_per_chip", "vs_baseline": value / 1e8,
        }))
        print(f"# N={n} steps={n_steps} wall={wall:.2f}s", file=sys.stderr)
        return
    if mode == "tersoff":
        # BASELINE config 2 companion metric
        n, n_steps, wall = run_tersoff(target_n, n_steps)
        value = n * n_steps / wall
        print(json.dumps({
            "metric": "tersoff_si_md_throughput", "value": value,
            "unit": "atom_step_per_s_per_chip", "vs_baseline": value / 1e8,
        }))
        print(f"# N={n} steps={n_steps} wall={wall:.2f}s", file=sys.stderr)
        return
    if os.environ.get("GPUMD_BENCH_CHILD"):
        # one attempt, exactly as the parent configured via env
        size = int(os.environ["GPUMD_BENCH_CHILD_N"])
        eng = os.environ["GPUMD_BENCH_CHILD_ENGINE"]
        n, n_steps, wall = run_once(size, n_steps, engine=eng)
        print(json.dumps({"n": n, "steps": n_steps, "wall": wall}))
        return

    # Each attempt runs in a KILLABLE subprocess: a wedged device RPC or a
    # Mosaic compiler hang must not take the whole benchmark down (round 5:
    # a hung RPC froze a 3-hour training run mid-flight).  Ladder:
    # round-5 compact-candidate engine -> round-4 full-window engine
    # (GPUMD_COMPACT_LISTS=0) -> XLA list path; then smaller sizes.
    import subprocess

    attempt_timeout = int(os.environ.get("GPUMD_BENCH_ATTEMPT_TIMEOUT",
                                         "2700"))
    sizes = [target_n, target_n // 4, target_n // 16]
    result = None
    for size in sizes:
        # (engine, compact_lists, banded): banded gathers (round 5) are the
        # first rung to drop — a band-slack abort falls back to full scans
        attempts = (
            [("dense", "1", "1"), ("dense", "1", "0"), ("dense", "0", "0"),
             ("list", "1", "1")]
            if engine == "dense" else [(engine, "1", "1")]
        )
        for eng, cl_flag, band_flag in attempts:
            env = dict(os.environ)
            env.update({
                "GPUMD_BENCH_CHILD": "1",
                "GPUMD_BENCH_CHILD_N": str(size),
                "GPUMD_BENCH_CHILD_ENGINE": eng,
                "GPUMD_COMPACT_LISTS": cl_flag,
                "GPUMD_BANDED": band_flag,
            })
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, timeout=attempt_timeout,
                    capture_output=True, text=True,
                )
                sys.stderr.write(out.stderr)
                if out.returncode == 0:
                    for line in out.stdout.splitlines():
                        line = line.strip()
                        if line.startswith("{"):
                            r = json.loads(line)
                            result = (r["n"], r["steps"], r["wall"])
                            break
                if result is not None:
                    break
                print(f"# bench at N~{size} ({eng}, cl={cl_flag}, "
                      f"band={band_flag}) failed rc={out.returncode}",
                      file=sys.stderr)
            except subprocess.TimeoutExpired:
                print(f"# bench at N~{size} ({eng}, cl={cl_flag}, "
                      f"band={band_flag}) HUNG "
                      f"(killed after {attempt_timeout}s)", file=sys.stderr)
        if result is not None:
            break
    if result is None:
        raise SystemExit("benchmark failed at all sizes")
    n, n_steps, wall = result
    value = n * n_steps / wall
    baseline = 1e8
    print(
        json.dumps(
            {
                "metric": "nep_pbte_md_throughput",
                "value": value,
                "unit": "atom_step_per_s_per_chip",
                "vs_baseline": value / baseline,
            }
        )
    )
    print(
        f"# N={n} steps={n_steps} wall={wall:.2f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
