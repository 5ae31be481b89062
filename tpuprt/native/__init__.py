"""Native (C++) host-side runtime components.

The reference's scene-compile hot spots (accelerator construction,
tessellation) are C++ (/root/reference/accelerators/*.cpp); here the same
stages are native too: each `csrc/*.cpp` exposes a C ABI consumed through
ctypes (no pybind11 in this image). Shared objects are built on demand with
g++ and cached next to the sources; every native entry point has a pure
NumPy fallback so the package still works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_DIR, "csrc")
_BUILD = os.path.join(_DIR, "_build")

_cache: dict = {}


def load(name: str):
    """Compile (if stale) and dlopen csrc/<name>.cpp -> _build/<name>.so.

    Returns a ctypes.CDLL, or None if no toolchain / compile failure —
    callers fall back to their NumPy implementation.
    """
    if name in _cache:
        return _cache[name]
    src = os.path.join(_CSRC, name + ".cpp")
    so = os.path.join(_BUILD, name + ".so")
    lib = None
    try:
        if (not os.path.exists(so) or
                os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(_BUILD, exist_ok=True)
            tmp = so + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-std=c++17", "-shared", "-fPIC", src, "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        lib = None
    _cache[name] = lib
    return lib
