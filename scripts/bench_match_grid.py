#!/usr/bin/env python
"""In-loop matcher benchmark at LARGE correspondence counts: brute sweep vs
the static-grid back-transform matcher (match_method="grid").

The reference caps at C=1000 correspondences where the brute C x nm sweep
is negligible. At C=1e5+ against multi-million-point clouds the sweep's
pair count dominates every iteration; the grid matcher replaces it with
O(27 * cell_cap) gathers per query against ONE prebuilt cell list.

Usage: python scripts/bench_match_grid.py [--n 12.5e6] [--cs 1000,100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_gated_scale import tile_cloud  # noqa: E402

DATA = "/root/reference/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", default="12.5e6")
    ap.add_argument("--cs", default="1000,100000")
    ap.add_argument("--radius", type=float, default=1.0)
    ap.add_argument("--methods", default="brute,grid")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    X_fix0 = read_xyz(f"{DATA}/dragon1.xyz")
    X_mov0 = read_xyz(f"{DATA}/dragon2.xyz")
    extent = float(np.max(X_fix0[:, 0]) - np.min(X_fix0[:, 0]))
    spacing = extent * 1.05

    n = int(float(args.n))
    Xf = tile_cloud(X_fix0, n, spacing)
    Xm = tile_cloud(X_mov0, n, spacing)
    Xf_d = jax.block_until_ready(jnp.asarray(Xf, jnp.float32))
    Xm_d = jax.block_until_ready(jnp.asarray(Xm, jnp.float32))

    rows = []
    for c_s in args.cs.split(","):
        C = int(float(c_s))
        per_method = {}
        for method in args.methods.split(","):
            cfg = IcpConfig(
                correspondences=C,
                max_overlap_distance=args.radius,
                match_method=method,
                # grid cap is data-static: compute once from the host cloud
                match_cell_cap=0,
            )
            # compile + first run
            t0 = time.perf_counter()
            res = icp_register(Xf_d, Xm_d, cfg)
            H = np.asarray(res.H)
            first = time.perf_counter() - t0
            assert int(res.error_code) == 0
            times = []
            for i in range(2):
                Xm_i = jax.block_until_ready(Xm_d + jnp.float32(1e-7 * (i + 1)))
                t0 = time.perf_counter()
                res = icp_register(Xf_d, Xm_i, cfg)
                H = np.asarray(res.H)
                times.append(time.perf_counter() - t0)
            t = float(np.median(times))
            per_method[method] = {
                "seconds": round(t, 4),
                "first_incl_compile": round(first, 2),
                "iterations": int(res.n_iterations),
                "sec_per_iteration": round(t / max(int(res.n_iterations), 1), 4),
                "H": np.asarray(res.H).tolist(),
            }
            print(f"C={C} {method}: {per_method[method]['seconds']} s "
                  f"({per_method[method]['iterations']} iters)", flush=True)
        row = {"n_points": n, "correspondences": C, **{
            f"{m}_seconds": v["seconds"] for m, v in per_method.items()
        }, **{
            f"{m}_sec_per_iter": v["sec_per_iteration"]
            for m, v in per_method.items()
        }}
        if len(per_method) == 2:
            Hb = np.asarray(per_method["brute"]["H"])
            Hg = np.asarray(per_method["grid"]["H"])
            row["H_maxdiff"] = float(np.abs(Hb - Hg).max())
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
