"""Native (C++) runtime components, loaded lazily via ctypes.

The reference keeps its host runtime (readers, orchestration) in C++
(ref: src/model/read_xyz.cu, src/main_gpumd/run.cu); the TPU rebuild does
the same for the host-side hot loops.  Shared objects are compiled on
first use with the system toolchain into ``~/.cache/gpumd_tpu`` and
memoized; every caller has a pure-Python fallback, so a missing compiler
only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_CACHE = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "gpumd_tpu",
)
_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_libs: dict = {}


def _build(name: str) -> str:
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    out = os.path.join(_CACHE, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_CACHE, exist_ok=True)
    tmp = out + ".tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def load(name: str):
    """ctypes handle for the named component, or None if unavailable."""
    if name in _libs:
        return _libs[name]
    try:
        lib = ctypes.CDLL(_build(name))
    except Exception:
        lib = None
    _libs[name] = lib
    return lib


def xyz_native():
    """The extended-XYZ row parser/writer (xyz_native.cpp), typed."""
    lib = load("xyz_native")
    if lib is None:
        return None
    if not getattr(lib, "_typed", False):
        lib.xyz_parse_rows.restype = ctypes.c_long
        lib.xyz_parse_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
        ]
        lib.xyz_parse_mem.restype = ctypes.c_long
        lib.xyz_parse_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
        ]
        lib.xyz_write_rows.restype = ctypes.c_int
        lib.xyz_write_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib._typed = True
    return lib
