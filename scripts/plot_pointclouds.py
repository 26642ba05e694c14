#!/usr/bin/env python
"""Render two (or three) xyz point clouds to a PNG for visual inspection.

Analog of the reference's MATLAB utility (/root/reference/data/
plot_pointclouds.m) and of the matplotlib hook in its Python test suite
(/root/reference/python/simpleicp/tests/test_simpleicp.py, plot_results):
scatter a random subsample of each cloud (full clouds are far too slow for
matplotlib) in a common frame, equal-aspect, and export the figure.

Typical use after a registration exported with `--export`:

    python scripts/plot_pointclouds.py fixed.xyz movable.xyz \
        --third registered.xyz --out check.png --view 3d
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _subsample(X: np.ndarray, n: int, rng: np.random.Generator) -> np.ndarray:
    if X.shape[0] <= n:
        return X
    return X[rng.permutation(X.shape[0])[:n]]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("cloud1", help="first xyz file (drawn red)")
    ap.add_argument("cloud2", help="second xyz file (drawn green)")
    ap.add_argument("--third", default="",
                    help="optional third xyz file, e.g. the registered "
                         "movable cloud (drawn blue)")
    ap.add_argument("--out", default="pointclouds.png",
                    help="output image path (default pointclouds.png)")
    ap.add_argument("--n", type=int, default=10000,
                    help="points plotted per cloud (random subsample)")
    ap.add_argument("--view", choices=("2d", "3d"), default="2d",
                    help="top-down xy view (the MATLAB util's view(2)) or "
                         "a 3d axes (the Python test hook)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from simpleicp_tpu.utils.xyz_io import read_xyz

    rng = np.random.default_rng(args.seed)
    paths = [args.cloud1, args.cloud2] + ([args.third] if args.third else [])
    colors = ["tab:red", "tab:green", "tab:blue"]
    clouds = [_subsample(np.asarray(read_xyz(p)), args.n, rng) for p in paths]

    fig = plt.figure(figsize=(8, 8), facecolor="w")
    if args.view == "3d":
        ax = fig.add_subplot(111, projection="3d")
        for X, c, p in zip(clouds, colors, paths):
            ax.scatter(X[:, 0], X[:, 1], X[:, 2], c=c, marker=".", s=2,
                       label=os.path.basename(p))
        ax.set_zlabel("z")
    else:
        ax = fig.add_subplot(111)
        for X, c, p in zip(clouds, colors, paths):
            ax.scatter(X[:, 0], X[:, 1], c=c, marker=".", s=2,
                       label=os.path.basename(p))
        ax.set_aspect("equal")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.legend(loc="upper right", markerscale=6)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out} ({sum(X.shape[0] for X in clouds)} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
