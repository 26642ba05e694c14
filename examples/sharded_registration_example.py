"""Multi-chip registration: both clouds sharded over a device mesh.

Runs on whatever devices are visible (on a CPU-only host, set
XLA_FLAGS=--xla_force_host_platform_device_count=8 to emulate 8 devices).
Same results and logging contract as the single-chip path; the clouds are
sharded over the mesh's points axis and the gate / selection / kNN /
solve reductions ride collectives (parallel/sharded.py).
"""

import os
import sys

# Runnable from a plain checkout: scripts/ uses the same bootstrap.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from simpleicp_tpu import IcpConfig
from simpleicp_tpu.parallel import make_mesh
from simpleicp_tpu.parallel.sharded import icp_register_sharded
from simpleicp_tpu.utils.xyz_io import read_xyz

DATA = "/root/reference/data"


def main():
    X_fix = read_xyz(f"{DATA}/dragon1.xyz")
    X_mov = read_xyz(f"{DATA}/dragon2.xyz")

    mesh = make_mesh()  # all visible devices on a ('points',) axis
    res = icp_register_sharded(
        X_fix, X_mov, IcpConfig(), mesh=mesh
    )
    print(f"devices: {mesh.devices.size}")
    print(f"converged: {bool(res.converged)} in {int(res.n_iterations)} iterations")
    print("H:")
    print(np.asarray(res.H).round(6))
    return res


if __name__ == "__main__":
    main()
