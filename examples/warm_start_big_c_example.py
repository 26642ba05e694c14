"""Coarse-to-fine warm start for big-correspondence registrations.

At the reference's default C=1000 one ICP iteration is milliseconds and a
warm start is pointless. At C=1e5 against a 12.5M-point cloud one EXACT
iteration is a 1.25e12-pair sweep (~5.6 s of device time), and most
iterations just walk H toward the basin. `warm_start=True` first registers
stride-subsampled clouds (cheap), then starts the expensive run from the
coarse result — same basin, roughly half the full-resolution iterations
(BENCHMARKS.md big-C notes).

This example demonstrates the mechanism at a laptop-friendly size; scale
`n` / `correspondences` up on real hardware. CLI equivalent:

    python -m simpleicp_tpu -f fix.xyz -m mov.xyz -c 100000 --warm-start
"""

import os
import sys
import time

# Runnable from a plain checkout: scripts/ uses the same bootstrap.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from simpleicp_tpu import IcpConfig, icp_register


def make_pair(rng, n):
    xy = rng.uniform(-2, 2, (n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    X_fix = np.column_stack([xy, z])
    a, t = 0.03, np.array([0.05, -0.04, 0.03])
    c, s = np.cos(a), np.sin(a)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return X_fix, (X_fix - t) @ R


def run(tag, X_fix, X_mov, cfg):
    t0 = time.perf_counter()
    res = icp_register(X_fix, X_mov, cfg)
    np.asarray(res.H)  # force completion
    dt = time.perf_counter() - t0
    print(f"{tag:>6}: {int(res.n_iterations)} full-resolution iterations, "
          f"{dt:.2f} s (incl. compile), converged={bool(res.converged)}")
    return np.asarray(res.H)


def main():
    rng = np.random.default_rng(7)
    X_fix, X_mov = make_pair(rng, 200_000)

    base = dict(correspondences=20_000)
    H_cold = run("cold", X_fix, X_mov, IcpConfig(**base))
    H_warm = run(
        "warm", X_fix, X_mov,
        IcpConfig(**base, warm_start=True, warm_start_points=20_000),
    )
    print(f"max |H_warm - H_cold| = {np.abs(H_warm - H_cold).max():.2e} "
          "(same basin)")


if __name__ == "__main__":
    main()
