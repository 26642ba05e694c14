#!/usr/bin/env python
"""Large-scale registration benchmark (the BASELINE "airborne at scale"
config: airborne-class clouds tiled/replicated to 50M points).

The reference's airborne dataset (1.34M pts/cloud) is absent from the
snapshot (/root/reference/.MISSING_LARGE_BLOBS); per BASELINE.json the scale
config synthesizes it by tiling. Clouds are tiled ON DEVICE from the dragon
pair (100k pts each) into a KxKxK grid of offset copies — no host transfer
of the big clouds, which would take minutes through a tunnel and isn't part
of the algorithm.

Reports wall time (readback-forced: a fetch of H guarantees execution
completed) and movable-cloud points/s through the full pipeline.

Usage: python scripts/bench_scale.py [--sizes 1.34e6,12.5e6,50e6] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"


def tile_cloud(X, n_target: int, spacing: float):
    """(n, 3) -> (n_target, 3): offset copies on a cubic grid, on device."""
    import jax.numpy as jnp

    n = X.shape[0]
    times = -(-n_target // n)
    k = math.ceil(times ** (1.0 / 3.0))
    ii = jnp.arange(k * k * k, dtype=X.dtype)[:times]
    off = jnp.stack([ii % k, (ii // k) % k, ii // (k * k)], axis=1) * spacing
    tiled = (X[None, :, :] + off[:, None, :]).reshape(-1, 3)
    return tiled[:n_target]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1.34e6,12.5e6,50e6")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    X_fix0 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), jnp.float32)
    X_mov0 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), jnp.float32)
    extent = float(jnp.max(X_fix0[:, 0]) - jnp.min(X_fix0[:, 0]))
    spacing = extent * 1.05

    rows = []
    for size_s in args.sizes.split(","):
        n = int(float(size_s))
        Xf = tile_cloud(X_fix0, n, spacing)
        Xm = tile_cloud(X_mov0, n, spacing)
        jax.block_until_ready((Xf, Xm))
        cfg = IcpConfig()

        res = icp_register(Xf, Xm, cfg)
        H = np.asarray(res.H)  # forces completion
        assert int(res.error_code) == 0, f"error {int(res.error_code)} at n={n}"

        times = []
        for i in range(args.repeats):
            Xm_i = Xm + jnp.float32(1e-7 * (i + 1))
            jax.block_until_ready(Xm_i)
            t0 = time.perf_counter()
            H = np.asarray(icp_register(Xf, Xm_i, cfg).H)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        it = int(res.n_iterations)
        rows.append({
            "n_points_per_cloud": n,
            "seconds": round(t, 4),
            "iterations": it,
            "converged": bool(res.converged),
            "mov_points_per_s": round(n * it / t, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
