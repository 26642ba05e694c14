"""Batch registration: many cloud pairs in ONE device program.

The reference registers one pair per process; on TPU the whole pipeline
vmaps (nothing has dynamic shapes), so B small pairs cost far less than B
separate launches — the serving-throughput path (models/icp.py:
icp_register_batch).
"""

import os
import sys

# Runnable from a plain checkout: scripts/ uses the same bootstrap.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from simpleicp_tpu import IcpConfig, icp_register_batch


def make_pair(rng, n=2000, angle=0.05):
    xy = rng.uniform(-1, 1, (n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(3 * xy[:, 1])
    X_fix = np.column_stack([xy, z])
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    t = rng.uniform(-0.1, 0.1, 3)
    return X_fix, X_fix @ R.T + t


def main():
    rng = np.random.default_rng(7)
    pairs = [make_pair(rng) for _ in range(8)]
    X_fix = np.stack([p[0] for p in pairs])   # (B, n, 3)
    X_mov = np.stack([p[1] for p in pairs])   # (B, n, 3)

    res = icp_register_batch(
        X_fix, X_mov, IcpConfig(correspondences=500, solver="linearized")
    )
    for b in range(X_fix.shape[0]):
        print(
            f"pair {b}: converged={bool(res.converged[b])} "
            f"iterations={int(res.n_iterations[b])} "
            f"t={np.asarray(res.H)[b][:3, 3].round(4)}"
        )
    return res


if __name__ == "__main__":
    main()
