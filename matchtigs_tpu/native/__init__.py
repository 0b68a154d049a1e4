"""Native (C++) runtime components, loaded via ctypes.

The reference offloads min-cost perfect matching to an external C++ binary
(blossom5) over file IPC; here the native solver is part of the framework:
``native/blossom.cpp`` is compiled once into ``_native.so`` and called
in-process.  The build is a plain g++ invocation cached next to the
package (no toolchain at runtime -> ImportError with a clear message).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = Path(__file__).resolve().parent / "_native.so"
_SOURCES = ["blossom.cpp"]

_lib: ctypes.CDLL | None = None


def _build() -> None:
    srcs = [str(_SRC_DIR / s) for s in _SOURCES]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        str(_LIB_PATH),
        *srcs,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _needs_rebuild() -> bool:
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    return any((_SRC_DIR / s).stat().st_mtime > lib_mtime for s in _SOURCES)


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if _needs_rebuild():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mwm_dense.restype = ctypes.c_longlong
    lib.mwm_dense.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib
