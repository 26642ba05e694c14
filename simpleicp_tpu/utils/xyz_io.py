"""xyz point-cloud file I/O.

File format contract shared by every reference implementation: plain text,
one `x y z` triple per line, whitespace separated, exactly three columns
(/root/reference/c++/src/simpleicp-cli.cpp:72-128,
/root/reference/rust/src/io.rs:9-37). Writers emit the CloudCompare-style
header of the reference Python (`//X Y Z`,
/root/reference/python/simpleicp/pointcloud.py:219-226).

Parser tiers, fastest first: the native C++ parser (simpleicp_tpu.native)
when built, pandas' C reader (vectorized, ~10x faster than np.loadtxt) when
installed, numpy loadtxt otherwise — so a wheel with no compiler and no
pandas still reads xyz files.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Union

import numpy as np


class XyzIOError(Exception):
    """Raised for malformed xyz input (wrong column count, non-numeric data)."""


def read_xyz(path: Union[str, Path], dtype=np.float64) -> np.ndarray:
    """Read an xyz file into an (n, 3) array.

    Skips blank lines and `//`-comment headers; enforces exactly three
    numeric columns like the reference CLIs.
    """
    path = os.fspath(path)
    if not os.path.exists(path):
        raise XyzIOError(f"file does not exist: {path}")
    try:
        from ..native import read_xyz_native  # optional C++ fast path

        return read_xyz_native(path, dtype=dtype)
    except ImportError:
        pass
    try:
        import pandas as pd
    except ImportError:
        # numpy-only last resort (slow but dependency-free): a minimal wheel
        # install with neither a C++ toolchain nor pandas can still read xyz.
        try:
            arr = np.loadtxt(path, comments="//", ndmin=2, dtype=np.float64)
        except ValueError as e:
            raise XyzIOError(f"failed to parse {path}: {e}") from e
        if arr.size == 0:
            arr = arr.reshape(0, 3)
        if arr.shape[1] != 3:
            raise XyzIOError(
                f"{path}: expected exactly 3 columns per line, found {arr.shape[1]}"
            )
        return np.ascontiguousarray(arr, dtype=dtype)

    try:
        df = pd.read_csv(
            path,
            sep=r"\s+",
            header=None,
            comment="/",
            dtype=np.float64,
            engine="c",
        )
    except (ValueError, pd.errors.ParserError) as e:
        raise XyzIOError(f"failed to parse {path}: {e}") from e
    if df.shape[1] != 3:
        raise XyzIOError(
            f"{path}: expected exactly 3 columns per line, found {df.shape[1]}"
        )
    return np.ascontiguousarray(df.to_numpy(), dtype=dtype)


def write_xyz(path: Union[str, Path], X: np.ndarray, fmt: str = "%.3f") -> None:
    """Write (n, 3) points with the CloudCompare header `//X Y Z`."""
    X = np.asarray(X)
    m = re.fullmatch(r"%\.(\d+)f", fmt)
    if m is not None:
        try:
            from ..native import write_xyz_native  # multithreaded formatter

            write_xyz_native(path, X, decimals=int(m.group(1)))
            return
        except ImportError:
            pass
    with open(os.fspath(path), "w") as f:
        f.write("//X Y Z\n")
        np.savetxt(f, X[:, :3], fmt=fmt, delimiter=" ")


def write_correspondences_xyz(path: Union[str, Path], X1: np.ndarray,
                              X2: np.ndarray, distances: np.ndarray) -> None:
    """Write per-correspondence debug rows, format of
    /root/reference/python/simpleicp/corrpts.py:213-237."""
    data = np.column_stack([X1, X2, distances])
    with open(os.fspath(path), "w") as f:
        f.write("//X1 Y1 Z1 X2 Y2 Z2 point_to_plane_distance\n")
        np.savetxt(f, data, delimiter=" ")
