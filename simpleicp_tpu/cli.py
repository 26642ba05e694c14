"""Command-line interface.

Flag names, short options, defaults, and semantics follow the reference CLIs
(/root/reference/c++/src/simpleicp-cli.cpp:15-35, /root/reference/rust/src/main.rs:10-46),
including "negative max_overlap_distance disables the gate". TPU-build
extensions: --solver, --export, --num-devices (sharded run).
"""

from __future__ import annotations

import argparse
import math
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="simpleicp-tpu",
        description="TPU-native point-to-plane ICP registration",
    )
    p.add_argument("-f", "--fixed", required=True, help="path of fixed point cloud (xyz)")
    p.add_argument("-m", "--movable", required=True, help="path of movable point cloud (xyz)")
    p.add_argument("-c", "--correspondences", type=int, default=1000)
    p.add_argument("-n", "--neighbors", type=int, default=10)
    p.add_argument("-p", "--min_planarity", type=float, default=0.3)
    p.add_argument(
        "-o", "--max_overlap_distance", type=float, default=-1.0,
        help="overlap gate radius; negative disables (reference contract)",
    )
    p.add_argument("-i", "--min_change", type=float, default=1.0)
    p.add_argument("-x", "--max_iterations", type=int, default=100)
    p.add_argument("--solver", choices=["nonlinear", "linearized"], default="nonlinear")
    p.add_argument("--export", default="", help="write the transformed movable cloud here")
    p.add_argument("--debug_dirpath", default="")
    p.add_argument(
        "--num-devices", type=int, default=0,
        help="shard the registration over this many devices (0 = single-chip)",
    )
    p.add_argument(
        "--approx-knn", action="store_true",
        help="hardware-assisted approximate kNN for normal estimation "
             "(TPU serving config; ~30%% faster, exact distances, "
             "~0.997 candidate recall)",
    )
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from . import PointCloud, SimpleICP
    from .utils.xyz_io import write_xyz

    pc_fix = PointCloud.from_xyz(args.fixed)
    pc_mov = PointCloud.from_xyz(args.movable)

    max_overlap = math.inf if args.max_overlap_distance < 0 else args.max_overlap_distance

    icp = SimpleICP(verbose=not args.quiet)
    icp.add_point_clouds(pc_fix, pc_mov)
    _, X_out, _, _ = icp.run(
        correspondences=args.correspondences,
        neighbors=args.neighbors,
        min_planarity=args.min_planarity,
        max_overlap_distance=max_overlap,
        min_change=args.min_change,
        max_iterations=args.max_iterations,
        solver=args.solver,
        debug_dirpath=args.debug_dirpath,
        approx_knn=args.approx_knn,
        num_devices=args.num_devices,
    )
    if args.export:
        write_xyz(args.export, X_out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
