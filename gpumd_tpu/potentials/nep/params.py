"""nep.txt parser -> static model config + parameter pytree.

File format (ref: src/force/nep.cu:100-395, Appendix A.4 of SURVEY.md):

  line 1:  nep{3|4|5}[_zbl][_dipole|_polarizability|_temperature|_charge{1,2,3}]
           <num_types> <sym...>
  [zbl rc_in rc_out [factor]]                       (if _zbl)
  cutoff rc_radial rc_angular [per-type pairs...] MN_radial MN_angular
  n_max  n_r n_a
  basis_size k_r k_a
  l_max L [q222 q1111 [q112 q123 q233 q134]]
  ANN neurons 0
  <one parameter per line>:
      per type t: w0[t] (neurons x dim, row-major), b0[t] (neurons),
                  w1[t] (neurons), [nep5: one extra per-type bias]
      global b1
      [polarizability: a second full ANN block]
      descriptor c array: for basis b (radial first, then angular),
                  num_types^2 values (type-pair minor)
  <dim q_scaler lines>
  [flexible-ZBL block: 10 values per type pair]

Parameters are split into a NepParams pytree shaped for vectorized
evaluation; the ANN is stored per type as stacked (T, ...) arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gpumd_tpu.elements import atomic_number


class NepParams(NamedTuple):
    """Trainable/loaded parameters (JAX arrays)."""

    w0: jnp.ndarray  # (T, neurons, dim)
    b0: jnp.ndarray  # (T, neurons)
    w1: jnp.ndarray  # (T, neurons)
    b1: jnp.ndarray  # () global output bias
    b1_type: jnp.ndarray  # (T,) per-type bias (NEP5; zeros for NEP4)
    c_radial: jnp.ndarray  # (T, T, n_max_r+1, basis_r+1)
    c_angular: jnp.ndarray  # (T, T, n_max_a+1, basis_a+1)
    q_scaler: jnp.ndarray  # (dim,)
    # Second ANN head (polarizability models); zeros otherwise.
    w0_pol: Optional[jnp.ndarray] = None
    b0_pol: Optional[jnp.ndarray] = None
    w1_pol: Optional[jnp.ndarray] = None
    b1_pol: Optional[jnp.ndarray] = None
    zbl_flex: Optional[jnp.ndarray] = None  # (T*(T+1)/2, 10) flexible ZBL
    # qNEP charge head (charge_mode > 0; ref: main_nep/nep_charge.cu:236-253)
    w1_charge: Optional[jnp.ndarray] = None  # (T, neurons)
    sqrt_epsilon_inf: Optional[jnp.ndarray] = None  # ()


@dataclass(frozen=True)
class NepModel:
    """Static NEP architecture descriptor (hashable; jit-static)."""

    version: int  # 3 | 4 | 5
    model_type: int  # 0 potential, 1 dipole, 2 polarizability, 3 temperature
    num_types: int
    symbols: tuple
    atomic_numbers: tuple
    rc_radial: tuple  # per-type radial cutoffs
    rc_angular: tuple
    mn_radial: int  # enlarged neighbor caps
    mn_angular: int
    n_max_radial: int
    n_max_angular: int
    basis_size_radial: int
    basis_size_angular: int
    l_max: int
    has_q: tuple = (0, 0, 0, 0, 0, 0)  # q222, q1111, q112, q123, q233, q134
    neurons: int = 30
    zbl: bool = False
    zbl_rc_inner: float = 0.0
    zbl_rc_outer: float = 0.0
    zbl_flexible: bool = False
    zbl_typewise_factor: float = 0.0
    charge_mode: int = 0  # 0 none; 1 real+kspace, 2 kspace only

    @property
    def num_l(self) -> int:
        return self.l_max + sum(self.has_q)

    @property
    def dim_angular(self) -> int:
        return (self.n_max_angular + 1) * self.num_l

    @property
    def dim(self) -> int:
        d = (self.n_max_radial + 1) + self.dim_angular
        if self.model_type == 3:
            d += 1
        return d

    @property
    def rc_radial_max(self) -> float:
        return max(self.rc_radial)

    @property
    def rc_angular_max(self) -> float:
        return max(self.rc_angular)

    def num_ann_params(self) -> int:
        if self.charge_mode:
            # per type: w0, b0, w1_energy, w1_charge; + sqrt_eps_inf + b1
            # (ref: main_nep/nep_charge.cu:309 (dim+3)*neu*T + 2)
            return (self.dim + 3) * self.neurons * self.num_types + 2
        if self.version == 5:
            n = ((self.dim + 2) * self.neurons + 1) * self.num_types + 1
        elif self.version == 3:
            # one shared ANN for all types (legacy NEP3 format)
            n = (self.dim + 2) * self.neurons + 1
        else:
            n = (self.dim + 2) * self.neurons * self.num_types + 1
        if self.model_type == 2:
            n *= 2
        return n

    def num_descriptor_params(self) -> int:
        t2 = self.num_types**2
        return t2 * (
            (self.n_max_radial + 1) * (self.basis_size_radial + 1)
            + (self.n_max_angular + 1) * (self.basis_size_angular + 1)
        )


def _parse_header_name(name: str):
    """First token -> (version, model_type, zbl)."""
    parts = name.split("_")
    if parts[0] not in ("nep3", "nep4", "nep5"):
        raise ValueError(f"unsupported NEP model name {name!r}")
    version = int(parts[0][3])
    zbl = "zbl" in parts[1:]
    model_type = 0
    charge_mode = 0
    for p in parts[1:]:
        if p == "dipole":
            model_type = 1
        elif p == "polarizability":
            model_type = 2
        elif p == "temperature":
            model_type = 3
        elif p.startswith("charge"):
            charge_mode = int(p[6:]) if len(p) > 6 else 1
    return version, model_type, zbl, charge_mode


def load_nep_txt(path: str, dtype=jnp.float32) -> Tuple[NepModel, NepParams]:
    with open(path) as f:
        tokens = f.read().split()
    pos = 0

    def take(k):
        nonlocal pos
        out = tokens[pos : pos + k]
        pos += k
        return out

    name = take(1)[0]
    version, model_type, zbl, charge_mode = _parse_header_name(name)
    if charge_mode:
        raise NotImplementedError("qNEP (charge) models: separate loader")
    num_types = int(take(1)[0])
    symbols = tuple(take(num_types))

    zbl_inner = zbl_outer = 0.0
    zbl_flexible = False
    zbl_factor = 0.0
    if zbl:
        tok = take(1)[0]
        if tok != "zbl":
            raise ValueError(f"{path}: expected 'zbl' line, got {tok!r}")
        zbl_inner, zbl_outer = float(take(1)[0]), float(take(1)[0])
        if zbl_inner == 0.0 and zbl_outer == 0.0:
            zbl_flexible = True
        # optional typewise factor: peek — next token must be 'cutoff' else factor
        if tokens[pos] not in ("cutoff",):
            zbl_factor = float(take(1)[0])

    tok = take(1)[0]
    if tok != "cutoff":
        raise ValueError(f"{path}: expected 'cutoff', got {tok!r}")
    # Either "rc_r rc_a MN_r MN_a" or per-type pairs then MN_r MN_a.
    # Find how many floats until 'n_max': total = 2*T + 2 or 4.
    rest = []
    while tokens[pos] != "n_max":
        rest.append(take(1)[0])
    if len(rest) == 4:
        rc_r = (float(rest[0]),) * num_types
        rc_a = (float(rest[1]),) * num_types
    elif len(rest) == 2 * num_types + 2:
        rc_r = tuple(float(rest[2 * i]) for i in range(num_types))
        rc_a = tuple(float(rest[2 * i + 1]) for i in range(num_types))
    else:
        raise ValueError(f"{path}: bad cutoff line ({len(rest)} values)")
    mn_radial_raw = int(rest[-2])
    mn_angular_raw = int(rest[-1])
    if mn_radial_raw > 819:
        raise ValueError("MN_radial exceeds 819")
    # Enlarged caps (ref: nep.cu:226-237).
    mn_radial = int(np.ceil(mn_radial_raw * 1.25))
    mn_angular = int(np.ceil(mn_angular_raw * 1.25))

    assert take(1)[0] == "n_max"
    n_max_r, n_max_a = int(take(1)[0]), int(take(1)[0])
    assert take(1)[0] == "basis_size"
    basis_r, basis_a = int(take(1)[0]), int(take(1)[0])
    assert take(1)[0] == "l_max"
    l_vals = []
    while tokens[pos].lower() != "ann":
        l_vals.append(int(take(1)[0]))
    l_max = l_vals[0]
    # Values after L_max may be written as L_max_4body/L_max_5body (e.g.
    # "l_max 4 2 1"); any nonzero enables the flag, matching the C parser's
    # truthiness (ref: nep.cu:273-293).
    has_q = tuple(1 if v else 0 for v in (l_vals[1:] + [0] * 6)[:6])

    assert take(1)[0].lower() == "ann"
    neurons = int(take(1)[0])
    take(1)  # trailing 0

    model = NepModel(
        version=version,
        model_type=model_type,
        num_types=num_types,
        symbols=symbols,
        atomic_numbers=tuple(atomic_number(s) for s in symbols),
        rc_radial=rc_r,
        rc_angular=rc_a,
        mn_radial=mn_radial,
        mn_angular=mn_angular,
        n_max_radial=n_max_r,
        n_max_angular=n_max_a,
        basis_size_radial=basis_r,
        basis_size_angular=basis_a,
        l_max=l_max,
        has_q=has_q,
        neurons=neurons,
        zbl=zbl,
        zbl_rc_inner=zbl_inner,
        zbl_rc_outer=zbl_outer,
        zbl_flexible=zbl_flexible,
        zbl_typewise_factor=zbl_factor,
    )

    n_para = model.num_ann_params() + model.num_descriptor_params()
    values = np.array([float(take(1)[0]) for _ in range(n_para + model.dim)])
    params = unflatten_params(model, values[:n_para], values[n_para:], dtype=dtype)

    if zbl_flexible:
        n_pair = num_types * (num_types + 1) // 2
        flex = np.array([float(take(1)[0]) for _ in range(10 * n_pair)])
        params = params._replace(
            zbl_flex=jnp.asarray(flex.reshape(n_pair, 10), dtype=dtype)
        )
    return model, params


def num_trainable(model: NepModel) -> int:
    """Trainable parameter count (ANN + descriptor c; excludes q_scaler)."""
    return model.num_ann_params() + model.num_descriptor_params()


def global_bias_index(model: NepModel) -> int:
    """Flat-vector slot of the global output bias b1 (the slot the trainer
    shifts to absorb the mean energy error, ref: fitness.cu:457
    `elite[number_of_variables_ann - 1] += energy_shift_per_structure`)."""
    t, neu, dim = model.num_types, model.neurons, model.dim
    per_type = (dim + 2) * neu
    if model.charge_mode:
        per_type += neu
    if model.version == 5:
        per_type += 1
    p = t * per_type
    if model.charge_mode:
        p += 1  # sqrt_eps_inf sits before b1
    return p


def params_from_vector(model: NepModel, theta, q_scaler=None) -> NepParams:
    """Traceable flat-vector -> NepParams (exact reference file ordering:
    per-type ANN blocks, global bias, then c basis-major type-pair-minor).
    Used by the SNES population evaluation (vmapped over theta)."""
    t, neu, dim = model.num_types, model.neurons, model.dim
    per_type = (dim + 2) * neu + (1 if model.version == 5 else 0)
    p = 0
    w0 = []
    b0 = []
    w1 = []
    b1_type = []
    w1q = []
    sqrt_eps = None
    for ty in range(t):
        w0.append(theta[p : p + neu * dim].reshape(neu, dim))
        p += neu * dim
        b0.append(theta[p : p + neu])
        p += neu
        w1.append(theta[p : p + neu])
        p += neu
        if model.charge_mode:
            # charge head rides directly after the energy head
            # (ref: nep_charge.cu:246 w1 spans num_outputs * neurons)
            w1q.append(theta[p : p + neu])
            p += neu
        if model.version == 5:
            b1_type.append(theta[p])
            p += 1
    if model.charge_mode:
        sqrt_eps = theta[p]  # before b1 (ref: nep_charge.cu:248-251)
        p += 1
    b1 = theta[p]
    p += 1
    # polarizability models carry a SECOND full ANN (the diagonal head),
    # laid out as another round of per-type blocks + bias
    # (ref: snes.cu:256-266 num_ann = 2 for train_mode 2)
    w0p = b0p = w1p = None
    b1p = None
    if model.model_type == 2:
        w0p, b0p, w1p = [], [], []
        for ty in range(t):
            w0p.append(theta[p : p + neu * dim].reshape(neu, dim))
            p += neu * dim
            b0p.append(theta[p : p + neu])
            p += neu
            w1p.append(theta[p : p + neu])
            p += neu
            if model.version == 5:
                p += 1  # per-type bias slot (unused by the pol head)
        b1p = theta[p]
        p += 1
    t2 = t * t
    nr = (model.n_max_radial + 1) * (model.basis_size_radial + 1)
    na = (model.n_max_angular + 1) * (model.basis_size_angular + 1)
    c = theta[p : p + t2 * (nr + na)]
    c_rad = (
        c[: t2 * nr].reshape(nr, t2).T.reshape(
            t, t, model.n_max_radial + 1, model.basis_size_radial + 1
        )
    )
    c_ang = (
        c[t2 * nr :].reshape(na, t2).T.reshape(
            t, t, model.n_max_angular + 1, model.basis_size_angular + 1
        )
    )
    if q_scaler is None:
        q_scaler = jnp.ones((dim,), theta.dtype)
    zeros_t = jnp.zeros((t,), theta.dtype)
    return NepParams(
        w0=jnp.stack(w0),
        b0=jnp.stack(b0),
        w1=jnp.stack(w1),
        b1=b1,
        b1_type=jnp.stack(b1_type) if b1_type else zeros_t,
        c_radial=c_rad,
        c_angular=c_ang,
        q_scaler=q_scaler,
        w0_pol=jnp.stack(w0p) if w0p is not None else None,
        b0_pol=jnp.stack(b0p) if w0p is not None else None,
        w1_pol=jnp.stack(w1p) if w0p is not None else None,
        b1_pol=b1p,
        w1_charge=jnp.stack(w1q) if w1q else None,
        sqrt_epsilon_inf=sqrt_eps,
    )


def variable_types(model: NepModel) -> np.ndarray:
    """Element class of each trainable variable (ref: snes.cu
    find_type_of_variable): ANN block of type t -> t; global bias and
    shared scalars -> num_types; c parameter -> its t1."""
    t, neu, dim = model.num_types, model.neurons, model.dim
    out = []
    per_type = (dim + 2) * neu + (1 if model.version == 5 else 0)
    for ty in range(t):
        out += [ty] * per_type
    out += [t]  # global bias
    t2 = t * t
    nr = (model.n_max_radial + 1) * (model.basis_size_radial + 1)
    na = (model.n_max_angular + 1) * (model.basis_size_angular + 1)
    for nk in range(nr + na):
        for t1 in range(t):
            out += [t1] * t
    return np.asarray(out, dtype=np.int32)


def write_nep_txt(path: str, model: NepModel, theta, q_scaler):
    """Write a nep.txt compatible with the reference MD engine
    (ref: format in nep.cu:100-395 / SURVEY.md A.4)."""
    name = f"nep{model.version}"
    if model.zbl:
        name += "_zbl"
    if model.model_type == 1:
        name += "_dipole"
    elif model.model_type == 2:
        name += "_polarizability"
    elif model.model_type == 3:
        name += "_temperature"
    if model.charge_mode:
        name += f"_charge{model.charge_mode}"
    lines = [f"{name} {model.num_types} " + " ".join(model.symbols)]
    if model.zbl:
        zline = f"zbl {model.zbl_rc_inner} {model.zbl_rc_outer}"
        if model.zbl_typewise_factor > 0.0:
            zline += f" {model.zbl_typewise_factor}"
        lines.append(zline)
    # write global cutoffs + raw MN (un-enlarged)
    mn_r = int(np.ceil(model.mn_radial / 1.25))
    mn_a = int(np.ceil(model.mn_angular / 1.25))
    lines.append(
        f"cutoff {model.rc_radial[0]} {model.rc_angular[0]} {mn_r} {mn_a}"
    )
    lines.append(f"n_max {model.n_max_radial} {model.n_max_angular}")
    lines.append(
        f"basis_size {model.basis_size_radial} {model.basis_size_angular}"
    )
    lines.append(
        f"l_max {model.l_max} "
        + " ".join(str(v) for v in model.has_q[:2])
    )
    lines.append(f"ANN {model.neurons} 0")
    theta = np.asarray(theta)
    q_scaler = np.asarray(q_scaler)
    for v in theta:
        lines.append(f"{v:15.7e}")
    for v in q_scaler:
        lines.append(f"{v:15.7e}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def random_params(model: NepModel, seed: int = 0, dtype=jnp.float32) -> NepParams:
    """Random NEP parameters with the right shapes (benchmarks, tests,
    trainer initialization)."""
    rng = np.random.default_rng(seed)
    t, neu, dim = model.num_types, model.neurons, model.dim
    r = model.basis_size_radial + 1
    a = model.basis_size_angular + 1

    def g(*shape):
        return jnp.asarray(rng.normal(0, 0.3, shape), dtype)

    zbl_flex = None
    if model.zbl and model.zbl_flexible:
        # plausible flexible-ZBL rows: rc1 < rc2, positive decay constants
        npair = t * (t + 1) // 2
        rows = np.empty((npair, 10))
        rows[:, 0] = rng.uniform(0.5, 1.0, npair)  # rc_inner
        rows[:, 1] = rng.uniform(1.5, 2.5, npair)  # rc_outer
        rows[:, 2::2] = rng.uniform(0.05, 0.5, (npair, 4))  # amplitudes
        rows[:, 3::2] = rng.uniform(0.3, 3.5, (npair, 4))  # decays
        zbl_flex = jnp.asarray(rows, dtype)
    return NepParams(
        w0=g(t, neu, dim),
        b0=g(t, neu),
        w1=g(t, neu),
        b1=jnp.asarray(rng.normal(), dtype),
        b1_type=jnp.zeros((t,), dtype)
        if model.version != 5
        else g(t),
        c_radial=g(t, t, model.n_max_radial + 1, r),
        c_angular=g(t, t, model.n_max_angular + 1, a),
        q_scaler=jnp.ones((dim,), dtype),
        zbl_flex=zbl_flex,
    )


def unflatten_params(
    model: NepModel, flat: np.ndarray, q_scaler: np.ndarray, dtype=jnp.float32
) -> NepParams:
    """Split the flat parameter vector exactly as the reference's
    update_potential (ref: nep.cu:227-283) and the c-refactor
    (ref: nep.cu:75-98)."""
    t, neu, dim = model.num_types, model.neurons, model.dim
    p = 0

    def ann_block():
        nonlocal p
        w0 = np.empty((t, neu, dim))
        b0 = np.empty((t, neu))
        w1 = np.empty((t, neu))
        b1_type = np.zeros((t,))
        # NEP3 shares ONE ANN across all types (num_para_ann =
        # (dim+2)*neurons + 1); broadcast it to the per-type layout so the
        # evaluation path is version-agnostic.
        n_blocks = 1 if model.version == 3 else t
        for ty in range(n_blocks):
            w0[ty] = flat[p : p + neu * dim].reshape(neu, dim)
            p += neu * dim
            b0[ty] = flat[p : p + neu]
            p += neu
            w1[ty] = flat[p : p + neu]
            p += neu
            if model.version == 5:
                b1_type[ty] = flat[p]
                p += 1
        if model.version == 3:
            w0[1:] = w0[0]
            b0[1:] = b0[0]
            w1[1:] = w1[0]
        b1 = flat[p]
        p += 1
        return w0, b0, w1, b1, b1_type

    w0, b0, w1, b1, b1_type = ann_block()
    pol = (None, None, None, None)
    if model.model_type == 2:
        pw0, pb0, pw1, pb1, _ = ann_block()
        pol = (
            jnp.asarray(pw0, dtype),
            jnp.asarray(pb0, dtype),
            jnp.asarray(pw1, dtype),
            jnp.asarray(pb1, dtype),
        )

    t2 = t * t
    nr = (model.n_max_radial + 1) * (model.basis_size_radial + 1)
    na = (model.n_max_angular + 1) * (model.basis_size_angular + 1)
    c = flat[p : p + t2 * (nr + na)]
    p += t2 * (nr + na)
    # File order: basis-major, type-pair minor (ref: nep.cu:85-94).
    c_rad = c[: t2 * nr].reshape(nr, t2).T.reshape(t, t, model.n_max_radial + 1,
                                                  model.basis_size_radial + 1)
    c_ang = c[t2 * nr :].reshape(na, t2).T.reshape(t, t, model.n_max_angular + 1,
                                                   model.basis_size_angular + 1)

    return NepParams(
        w0=jnp.asarray(w0, dtype),
        b0=jnp.asarray(b0, dtype),
        w1=jnp.asarray(w1, dtype),
        b1=jnp.asarray(b1, dtype),
        b1_type=jnp.asarray(b1_type, dtype),
        c_radial=jnp.asarray(c_rad, dtype),
        c_angular=jnp.asarray(c_ang, dtype),
        q_scaler=jnp.asarray(q_scaler, dtype),
        w0_pol=pol[0],
        b0_pol=pol[1],
        w1_pol=pol[2],
        b1_pol=pol[3],
    )
