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


_SOURCES = (
    "xyz_parser.cpp",
    "xyz_writer.cpp",
    "pack_occupancy.cpp",
    "argsort.cpp",
)


def build() -> str:
    """Compile the native library in-place. Returns the .so path."""
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-fopenmp",
        "-shared", "-fPIC", "-o", _SO, *srcs,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    if _lib is not None:
        return _lib
    newest_src = max(
        os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES
    )
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
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
    for name, cfloat in (
        ("argsort_f32", ctypes.c_float),
        ("argsort_f64", ctypes.c_double),
    ):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(cfloat),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
    lib.xyz_write.restype = ctypes.c_int64
    lib.xyz_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    i64 = ctypes.c_int64
    for name, cfloat in (
        ("pack_occupancy_f32", ctypes.c_float),
        ("pack_occupancy_f64", ctypes.c_double),
    ):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(cfloat), i64, ctypes.POINTER(cfloat), cfloat,
            i64, i64, i64, i64, ctypes.POINTER(ctypes.c_uint32),
        ]
    _lib = lib
    return lib


def pack_occupancy_native(X, origin, inv_cell, dims, wz: int) -> "np.ndarray":
    """Bin + OR-scatter the packed occupancy grid in one multithreaded
    native pass (ops/dilate_gate.py's host packing step; numpy's
    bitwise_or.at is a serial ufunc loop). X must be C-contiguous (n, 3)
    float32 or float64; binning replicates the device arithmetic exactly
    (see pack_occupancy.cpp)."""
    lib = _load()
    X = np.ascontiguousarray(X)
    if X.dtype == np.float32:
        fn, ct = lib.pack_occupancy_f32, ctypes.c_float
    elif X.dtype == np.float64:
        fn, ct = lib.pack_occupancy_f64, ctypes.c_double
    else:
        raise TypeError(f"unsupported dtype {X.dtype}")
    origin = np.ascontiguousarray(origin, X.dtype)
    grid = np.zeros(int(wz) * dims[0] * dims[1], np.uint32)
    fn(
        X.ctypes.data_as(ctypes.POINTER(ct)),
        X.shape[0],
        origin.ctypes.data_as(ctypes.POINTER(ct)),
        ct(float(inv_cell)),
        dims[0], dims[1], dims[2], int(wz),
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return grid


def argsort_native(keys: "np.ndarray") -> "np.ndarray":
    """Stable ascending argsort of a 1-D f32/f64 array (parallel LSD radix,
    argsort.cpp). Tie order matches numpy kind='stable' except -0.0 sorts
    before +0.0 and NaNs by bit pattern — callers must be tie-order
    independent (the slab join only needs nondecreasing keys)."""
    lib = _load()
    keys = np.ascontiguousarray(keys)
    if keys.dtype == np.float32:
        fn, ct = lib.argsort_f32, ctypes.c_float
    elif keys.dtype == np.float64:
        fn, ct = lib.argsort_f64, ctypes.c_double
    else:
        raise TypeError(f"unsupported dtype {keys.dtype}")
    if keys.shape[0] >= (1 << 31):
        raise ValueError("argsort_native is int32-indexed")
    out = np.empty(keys.shape[0], np.int32)
    fn(
        keys.ctypes.data_as(ctypes.POINTER(ct)),
        keys.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def write_xyz_native(path: str, X: "np.ndarray", decimals: int = 6,
                     header: str = "//X Y Z\n") -> None:
    """Write (n, 3) points with the native multithreaded formatter —
    snprintf("%.<decimals>f") per row, byte-identical to np.savetxt's
    printf fixed format (utils/xyz_io.py routes plain %.Nf writes here)."""
    lib = _load()
    X = np.ascontiguousarray(np.asarray(X)[:, :3], np.float64)
    errbuf = ctypes.create_string_buffer(256)
    rc = lib.xyz_write(
        os.fspath(path).encode(),
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        X.shape[0],
        int(decimals),
        header.encode(),
        errbuf,
        len(errbuf),
    )
    if rc != 0:
        from ..utils.xyz_io import XyzIOError

        raise XyzIOError(f"{path}: {errbuf.value.decode()}")


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
