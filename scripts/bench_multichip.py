#!/usr/bin/env python
"""Multi-chip scaling benchmark: points/s efficiency of the sharded
registration vs the single-chip engine (NEXT.md item 1; BASELINE target
>= 70% scaling efficiency at 8 chips on the 50M config).

For each device count d in --devices, registers a tiled-dragon pair of
--n points over a d-device 1-D points mesh and reports wall time,
movable points/s, and efficiency vs d=1 (points/s_d / (d * points/s_1)).
Clouds are tiled on device (no host upload of the big arrays); timing is
readback-forced with a fresh 1e-7 jitter per repeat (CLAUDE.md
methodology).

Runs unchanged on real multi-chip hardware (default) or on a virtual CPU
mesh for a correctness shakeout:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_multichip.py --cpu --n 1e6 --devices 1,2,8
Virtual-mesh timings share one physical socket, so efficiency numbers
only mean something on real chips.

Usage: python scripts/bench_multichip.py [--n 50e6] [--devices 1,2,4,8]
           [--repeats 3] [--out FILE.json] [--cpu]
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
    import jax.numpy as jnp

    n = X.shape[0]
    times = -(-n_target // n)
    k = math.ceil(times ** (1.0 / 3.0))
    ii = jnp.arange(k * k * k, dtype=X.dtype)[:times]
    off = jnp.stack([ii % k, (ii // k) % k, ii // (k * k)], axis=1) * spacing
    return (X[None, :, :] + off[:, None, :]).reshape(-1, 3)[:n_target]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=50e6)
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default: 1..all "
                         "in powers of two)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual-mesh shakeout; "
                         "pair with xla_force_host_platform_device_count)")
    ap.add_argument("--overlap", type=float, default=0.0,
                    help="max_overlap_distance for a GATED sweep (0 = no "
                         "gate); enables the gate-collective A/B")
    ap.add_argument("--gate-collective", default="ring",
                    choices=["ring", "allgather", "both"],
                    help="sharded gate strategy to time (only with "
                         "--overlap); 'both' A/Bs ring vs allgather per "
                         "device count")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.parallel import icp_register_sharded, make_mesh
    from simpleicp_tpu.utils.xyz_io import read_xyz

    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(v) for v in args.devices.split(",")]
    else:
        counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_avail]
    bad = [d for d in counts if d > n_avail]
    if bad:
        raise SystemExit(f"device counts {bad} exceed available {n_avail}")

    N = int(args.n)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X1 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), dtype)
    X2 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), dtype)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    X_fix = jax.block_until_ready(tile_cloud(X1, N, ext * 1.05))
    X_mov = jax.block_until_ready(tile_cloud(X2, N, ext * 1.05))
    collectives = (["ring", "allgather"] if args.gate_collective == "both"
                   else [args.gate_collective])
    base_cfg = (IcpConfig(max_overlap_distance=args.overlap)
                if args.overlap > 0 else IcpConfig())

    rng = np.random.default_rng(0)
    rows = []
    for d, coll in [(d, c) for d in counts for c in collectives]:
        import dataclasses

        cfg = dataclasses.replace(base_cfg, gate_collective=coll)
        mesh = make_mesh(d)
        # compile + correctness pass (excluded from timing, like bench.py)
        res = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
        np.asarray(res.H)
        assert int(res.error_code) == 0, f"d={d}: error {int(res.error_code)}"
        times = []
        for _ in range(args.repeats):
            Xm_i = jax.block_until_ready(
                X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)), dtype)
            )
            t0 = time.perf_counter()
            res = icp_register_sharded(X_fix, Xm_i, cfg, mesh=mesh)
            np.asarray(res.H)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        pps = N / t
        # efficiency vs the smallest device count OF THE SAME collective
        base_rows = [r for r in rows if r["gate_collective"] == coll]
        if base_rows:
            b = base_rows[0]
            eff = pps / ((d / b["devices"]) * b["points_per_s"])
        else:
            eff = 1.0
        rows.append({
            "devices": d, "gate_collective": coll,
            "seconds": round(t, 3),
            "points_per_s": round(pps, 1),
            "efficiency_vs_1": round(eff, 3),
            "iterations": int(res.n_iterations),
        })
        print(f"d={d} ({coll}): {t:.3f} s, {pps:.3g} pts/s, "
              f"eff={rows[-1]['efficiency_vs_1']:.0%}, "
              f"iters={rows[-1]['iterations']}", flush=True)

    out = {"n_points": N, "backend": jax.default_backend(), "rows": rows}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
