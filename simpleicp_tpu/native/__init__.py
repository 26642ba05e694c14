"""Native (C++) runtime components, loaded via ctypes.

Build with `make -C simpleicp_tpu/native` (or the build() helper below —
called automatically on first import when a compiler is available). If the
shared library is absent and cannot be built, importing the symbols raises
ImportError and pure-Python fallbacks take over (utils/xyz_io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsimpleicp_native.so")

_lib = None


def build() -> str:
    """Compile the native library in-place. Returns the .so path."""
    src = os.path.join(_DIR, "xyz_parser.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO, src,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_DIR, "xyz_parser.cpp")
    ):
        try:
            build()
        except (OSError, subprocess.CalledProcessError) as e:
            raise ImportError(f"native library unavailable: {e}") from e
    lib = ctypes.CDLL(_SO)
    lib.xyz_count_and_parse.restype = ctypes.c_int64
    lib.xyz_count_and_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def read_xyz_native(path: str, dtype=np.float64) -> np.ndarray:
    """Parse an xyz file with the native mmap parser (two passes: count,
    then fill — no reallocation, no Python-level line loop)."""
    lib = _load()
    errbuf = ctypes.create_string_buffer(256)
    path_b = os.fspath(path).encode()

    n = lib.xyz_count_and_parse(path_b, None, 0, errbuf, len(errbuf))
    if n < 0:
        from ..utils.xyz_io import XyzIOError

        raise XyzIOError(f"{path}: {errbuf.value.decode()}")
    out = np.empty((n, 3), dtype=np.float64)
    n2 = lib.xyz_count_and_parse(
        path_b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        errbuf,
        len(errbuf),
    )
    if n2 != n:
        from ..utils.xyz_io import XyzIOError

        raise XyzIOError(f"{path}: {errbuf.value.decode()}")
    return out.astype(dtype, copy=False)
