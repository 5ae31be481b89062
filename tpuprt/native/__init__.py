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
import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_DIR, "csrc")
_BUILD = os.path.join(_DIR, "_build")

_cache: dict = {}


def _src_digest(src: str) -> str:
    """Cache key: source CONTENT hash, not mtime (git checkouts don't
    preserve mtimes, so an mtime check could dlopen a stale/foreign
    binary — ADVICE r4). -march=native makes binaries host-specific, so
    the host's CPU model is folded into the key too: a _build dir moved
    between machines recompiles instead of SIGILLing."""
    h = hashlib.sha256()
    with open(src, "rb") as f:
        h.update(f.read())
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"model name"):
                    h.update(line)
                    break
    except OSError:
        pass
    return h.hexdigest()[:16]


def load(name: str):
    """Compile (if not cached) and dlopen csrc/<name>.cpp ->
    _build/<name>-<srchash>.so. Shared objects are NEVER committed
    (gitignored); they are built from source on first use.

    Returns a ctypes.CDLL, or None if no toolchain / compile failure —
    callers fall back to their NumPy implementation.
    """
    if name in _cache:
        return _cache[name]
    src = os.path.join(_CSRC, name + ".cpp")
    lib = None
    try:
        so = os.path.join(_BUILD, f"{name}-{_src_digest(src)}.so")
        if not os.path.exists(so):
            os.makedirs(_BUILD, exist_ok=True)
            tmp = so + f".tmp{os.getpid()}"
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
