"""Extended-XYZ reader/writer (model.xyz / train.xyz / dump files).

Format per the reference (ref: src/model/read_xyz.cu:163-330 and
src/main_nep/structure.cu):

  line 1: N
  line 2: key=value attributes; quoted values may contain spaces.
          Lattice="ax ay az bx by bz cx cy cz" (rows = lattice vectors)
          Properties=species:S:1:pos:R:3[:mass:R:1][:charge:R:1]
                      [:vel:R:3][:group:I:k][:force(s):R:3]
          pbc="T T F"   energy=...  virial="9 floats"  stress="..."
          weight=... energy_weight=... temperature=... config_type=...
  lines 3..N+2: whitespace-separated columns per Properties.

This is a pure-numpy host-side module (no JAX).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from gpumd_tpu.elements import MASS_TABLE


@dataclass
class XYZFrame:
    """One extended-XYZ frame (host-side numpy)."""

    symbols: List[str]
    positions: np.ndarray  # (N, 3)
    lattice: Optional[np.ndarray] = None  # (3, 3) rows = a, b, c
    pbc: tuple = (True, True, True)
    masses: Optional[np.ndarray] = None
    charges: Optional[np.ndarray] = None
    velocities: Optional[np.ndarray] = None
    forces: Optional[np.ndarray] = None
    groups: Optional[np.ndarray] = None  # (N, num_group_methods) int
    info: Dict[str, str] = field(default_factory=dict)
    # every parsed per-atom column (e.g. bec:R:9 for qNEP training)
    arrays: Dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def n_atoms(self) -> int:
        return len(self.symbols)

    def default_masses(self) -> np.ndarray:
        if self.masses is not None:
            return self.masses
        return np.array([MASS_TABLE[s] for s in self.symbols])


_TOKEN_RE = re.compile(r'(\S+)="([^"]*)"|(\S+)=(\S+)|(\S+)')


def _parse_comment(line: str) -> Dict[str, str]:
    """Parse key=value pairs; quoted values keep spaces. Case-insensitive keys
    (the reference lowercases keys before matching)."""
    out: Dict[str, str] = {}
    for m in _TOKEN_RE.finditer(line.strip()):
        if m.group(1) is not None:
            out[m.group(1).lower()] = m.group(2)
        elif m.group(3) is not None:
            out[m.group(3).lower()] = m.group(4)
        else:
            out[m.group(5).lower()] = ""
    return out


def _parse_properties(spec: str):
    """Split Properties=name:type:count triplets into (name, type, count)."""
    parts = spec.split(":")
    if len(parts) % 3 != 0:
        raise ValueError(f"Malformed Properties spec: {spec!r}")
    props = []
    for i in range(0, len(parts), 3):
        props.append((parts[i].lower(), parts[i + 1].upper(), int(parts[i + 2])))
    return props


def read_xyz_frames(path: str, max_frames: Optional[int] = None) -> List[XYZFrame]:
    """Read one or more extended-XYZ frames from a file."""
    frames: List[XYZFrame] = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    n_lines = len(lines)
    while i < n_lines:
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        n = int(line.split()[0])
        info = _parse_comment(lines[i + 1])
        body = lines[i + 2 : i + 2 + n]
        if len(body) < n:
            raise ValueError(f"{path}: truncated frame at line {i + 1}")
        frames.append(_build_frame(n, info, body, path))
        i += 2 + n
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError(f"{path}: no frames found")
    return frames


def read_xyz(path: str) -> XYZFrame:
    """Read the first frame (model.xyz semantics)."""
    return read_xyz_frames(path, max_frames=1)[0]


# native row parser kicks in above this atom count (the Python loop costs
# ~5 us/token; the C strtod loop ~20 ns/token)
_NATIVE_MIN_ROWS = 4096


def _parse_body(n: int, props, body: List[str]):
    """Atom-line columns -> (symbols, arrays); native C++ fast path for
    large frames (gpumd_tpu/native/xyz_native.cpp; ref: the reference's
    host reader is likewise native C++, read_xyz.cu:163-330)."""
    n_cols = sum(count for _, _, count in props)
    species_col = -1
    col = 0
    for name, typ, count in props:
        if name == "species":
            species_col = col
        col += count

    symbols: List[str] = []
    arrays: Dict[str, np.ndarray] = {}

    native = None
    if n >= _NATIVE_MIN_ROWS:
        from gpumd_tpu.native import xyz_native

        native = xyz_native()
    if native is not None:
        import ctypes

        buf = "".join(body).encode()
        n_num = n_cols - (1 if species_col >= 0 else 0)
        species_buf = ctypes.create_string_buffer(max(n * 16, 16))
        numeric = np.empty((n, n_num), np.float64)
        got = native.xyz_parse_mem(
            buf, len(buf), n, n_cols, species_col, species_buf,
            numeric.ctypes.data_as(ctypes.c_void_p),
        )
        if got == n:
            if species_col >= 0:
                symbols = (
                    np.frombuffer(species_buf.raw[: n * 16], dtype="S16")
                    .astype("U15")
                    .tolist()
                )
            ncol = 0
            for name, typ, count in props:
                if name == "species":
                    continue
                arr = numeric[:, ncol : ncol + count]
                ncol += count
                if typ == "I":
                    arr = arr.astype(np.int64)
                arrays[name] = (
                    arr if count > 1
                    else arr[:, 0] if name not in ("group",) else arr
                )
            return symbols, arrays
        # fall through to the Python path on parse failure

    cols = [ln.split() for ln in body]
    col = 0
    for name, typ, count in props:
        if name == "species":
            symbols = [c[col] for c in cols]
        else:
            if typ == "I":
                arr = np.array(
                    [[int(c[col + k]) for k in range(count)] for c in cols],
                    dtype=np.int64,
                )
            else:
                arr = np.array(
                    [[float(c[col + k]) for k in range(count)] for c in cols]
                )
            arrays[name] = (
                arr if count > 1
                else arr[:, 0] if name not in ("group",) else arr
            )
        col += count
    return symbols, arrays


def _build_frame(n: int, info: Dict[str, str], body: List[str], path: str) -> XYZFrame:
    prop_spec = info.get("properties", "species:S:1:pos:R:3")
    props = _parse_properties(prop_spec)

    lattice = None
    if "lattice" in info:
        vals = [float(x) for x in info["lattice"].split()]
        if len(vals) != 9:
            raise ValueError(f"{path}: Lattice must have 9 numbers")
        lattice = np.array(vals).reshape(3, 3)

    pbc = (True, True, True)
    if "pbc" in info:
        toks = info["pbc"].split()
        pbc = tuple(t.upper() in ("T", "TRUE", "1") for t in toks)

    symbols, arrays = _parse_body(n, props, body)

    positions = arrays.get("pos")
    if positions is None:
        raise ValueError(f"{path}: Properties must include pos:R:3")

    forces = arrays.get("force", arrays.get("forces"))
    return XYZFrame(
        symbols=symbols,
        positions=positions,
        lattice=lattice,
        pbc=pbc,
        masses=arrays.get("mass"),
        charges=arrays.get("charge"),
        velocities=arrays.get("vel"),
        forces=forces,
        groups=arrays.get("group"),
        info=info,
        arrays=arrays,
    )


def write_xyz(
    path: str,
    frame: XYZFrame,
    append: bool = False,
    with_velocities: bool = False,
    with_forces: bool = False,
    with_masses: bool = False,
    with_groups: bool = False,
    extra_info: Optional[Dict[str, str]] = None,
):
    """Write one extended-XYZ frame (dump_exyz / dump_restart semantics)."""
    prop = "species:S:1:pos:R:3"
    if with_masses and frame.masses is not None:
        prop += ":mass:R:1"
    if with_velocities and frame.velocities is not None:
        prop += ":vel:R:3"
    if with_forces and frame.forces is not None:
        prop += ":forces:R:3"
    if with_groups and frame.groups is not None:
        prop += f":group:I:{frame.groups.shape[1]}"

    parts = []
    if frame.lattice is not None:
        lat = " ".join(f"{x:.15g}" for x in np.asarray(frame.lattice).ravel())
        parts.append(f'Lattice="{lat}"')
    parts.append(f"Properties={prop}")
    pb = " ".join("T" if p else "F" for p in frame.pbc)
    parts.append(f'pbc="{pb}"')
    for k, v in (extra_info or {}).items():
        parts.append(f"{k}={v}")

    n = frame.n_atoms
    if n >= _NATIVE_MIN_ROWS:
        from gpumd_tpu.native import xyz_native

        native = xyz_native()
        if native is not None:
            cols = [np.asarray(frame.positions, np.float64)]
            if with_masses and frame.masses is not None:
                cols.append(np.asarray(frame.masses, np.float64)[:, None])
            if with_velocities and frame.velocities is not None:
                cols.append(np.asarray(frame.velocities, np.float64))
            if with_forces and frame.forces is not None:
                cols.append(np.asarray(frame.forces, np.float64))
            if with_groups and frame.groups is not None:
                g = np.asarray(frame.groups, np.float64)
                cols.append(g if g.ndim > 1 else g[:, None])
            numeric = np.ascontiguousarray(np.hstack(cols))
            sp = np.array(frame.symbols, dtype="S16")
            header = (f"{n}\n" + " ".join(parts) + "\n").encode()
            rc = native.xyz_write_rows(
                path.encode(), 1 if append else 0, header, n,
                sp.tobytes(), numeric.shape[1],
                numeric.ctypes.data_as(__import__("ctypes").c_void_p),
            )
            if rc == 0:
                return
            # fall back to the Python writer on native failure

    mode = "a" if append else "w"
    with open(path, mode) as f:
        f.write(f"{frame.n_atoms}\n")
        f.write(" ".join(parts) + "\n")
        for i in range(frame.n_atoms):
            row = [f"{frame.symbols[i]:<2s}"]
            row += [f"{x:.15g}" for x in frame.positions[i]]
            if with_masses and frame.masses is not None:
                row.append(f"{frame.masses[i]:.15g}")
            if with_velocities and frame.velocities is not None:
                row += [f"{x:.15g}" for x in frame.velocities[i]]
            if with_forces and frame.forces is not None:
                row += [f"{x:.15g}" for x in frame.forces[i]]
            if with_groups and frame.groups is not None:
                row += [str(int(g)) for g in frame.groups[i]]
            f.write(" ".join(row) + "\n")
