"""Minimal working example: bunny with partial overlap.

Mirror of /root/reference/python/simpleicp/tests/minimal_working_example.py.
"""

import os
import sys

# Runnable from a plain checkout: scripts/ uses the same bootstrap.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathlib import Path

from simpleicp_tpu import PointCloud, SimpleICP

DATA = Path("/root/reference/data")


def main():
    pc_fix = PointCloud.from_xyz(DATA / "bunny_part1.xyz")
    pc_mov = PointCloud.from_xyz(DATA / "bunny_part2.xyz")

    icp = SimpleICP()
    icp.add_point_clouds(pc_fix, pc_mov)
    H, X_mov_transformed, rigid_body_transformation_params, distance_residuals = (
        icp.run(max_overlap_distance=1.0)
    )
    return H


if __name__ == "__main__":
    main()
