#!/usr/bin/env python
"""Small-dataset dispatch-path audit (round-4 verdict item 4).

The recorded sub-dragon numbers (bunny 59 ms) lose to the fastest native
reference (Rust 50 ms) mostly on the ~32 ms test-tunnel roundtrip. This
script separates the three components on the live device:

  floor   — dispatch+fetch latency of a trivial cached program (pure
            tunnel/runtime overhead, no algorithm content);
  wall    — end-to-end per-registration wall time, reference-comparable
            methodology (perturbed inputs, forced H readback, median);
  device  — estimated on-device algorithm time from a pipelined batch:
            K registrations enqueued back-to-back with ONE readback at the
            end amortize the roundtrip, so
            (T_batch - T_single) / (K - 1) ~= per-run device time.

Usage: python scripts/audit_small_path.py [--repeats 9] [--batch 8]
                                          [--out FILE.json]
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

CASES = {
    "dragon": ("dragon1.xyz", "dragon2.xyz", {}, None, None),
    "bunny": ("bunny_part1.xyz", "bunny_part2.xyz",
              {"max_overlap_distance": 1.0}, None, None),
    "multisensor": (
        "multisensor_lidar.xyz", "multisensor_radar.xyz",
        {"max_overlap_distance": 1.0},
        (-0.5 * math.pi / 180.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        (math.inf, math.inf, 0.0, 0.0, 0.0, 0.0),
    ),
    "webots": (
        "webots1.xyz", "webots2.xyz",
        {"neighbors": 40, "max_overlap_distance": 0.5},
        (0.0, 0.0, -60.0 * math.pi / 180.0, -0.05, -0.09, 0.0),
        (0.0,) * 6,
    ),
}

# Fastest reference implementation per dataset (/root/reference/README.md:186)
REF_BEST = {"dragon": 0.07, "bunny": 0.05}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--cases", default=",".join(CASES))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models.icp import icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    out = {"backend": jax.default_backend()}

    # ---- tunnel floor: trivial cached program, dispatch + scalar fetch ----
    tiny = jax.jit(lambda x: (x * 2.0).sum())
    xd = jax.device_put(jnp.ones((8, 8), jnp.float32))
    np.asarray(tiny(xd))  # compile
    floors = []
    for rep in range(args.repeats):
        xi = jax.block_until_ready(xd + np.float32(rep))
        t0 = time.perf_counter()
        np.asarray(tiny(xi))
        floors.append(time.perf_counter() - t0)
    out["floor_s"] = {
        "median": round(float(np.median(floors)), 4),
        "min": round(float(np.min(floors)), 4),
        "max": round(float(np.max(floors)), 4),
    }
    print(f"tunnel floor: {out['floor_s']}", flush=True)

    rng = np.random.default_rng(0)
    out["cases"] = {}
    for name in args.cases.split(","):
        fixed, movable, kw, obs_v, obs_w = CASES[name]
        X_fix = jnp.asarray(read_xyz(f"{DATA}/{fixed}"), jnp.float32)
        X_mov = jnp.asarray(read_xyz(f"{DATA}/{movable}"), jnp.float32)
        jax.block_until_ready((X_fix, X_mov))
        cfg = IcpConfig(**kw)
        ov = None if obs_v is None else np.asarray(obs_v, np.float64)
        ow = None if obs_w is None else np.asarray(obs_w, np.float64)

        def go(Xm):
            return icp_register(
                X_fix, Xm, cfg,
                rbp_observed_values=ov, rbp_observation_weights=ow,
            )

        res = go(X_mov)  # compile
        np.asarray(res.H)
        assert int(res.error_code) == 0, name

        jitters = [
            jax.block_until_ready(
                X_mov + jnp.asarray(
                    rng.uniform(-1e-7, 1e-7, (1, 3)), jnp.float32
                )
            )
            for _ in range(max(args.repeats, args.batch))
        ]

        # wall: one registration per timing, forced readback
        walls = []
        for Xm in jitters[: args.repeats]:
            t0 = time.perf_counter()
            r = go(Xm)
            np.asarray(r.H)
            walls.append(time.perf_counter() - t0)
        wall = float(np.median(walls))

        # pipelined batch: K enqueued registrations, one readback at the end
        t0 = time.perf_counter()
        rs = [go(Xm) for Xm in jitters[: args.batch]]
        np.asarray(rs[-1].H)
        jax.block_until_ready([r.H for r in rs])
        t_batch = time.perf_counter() - t0
        dev_est = max(t_batch - wall, 0.0) / max(args.batch - 1, 1)

        row = {
            "n_fix": int(X_fix.shape[0]), "n_mov": int(X_mov.shape[0]),
            "iterations": int(res.n_iterations),
            "wall_s": {
                "median": round(wall, 4),
                "min": round(float(np.min(walls)), 4),
                "max": round(float(np.max(walls)), 4),
            },
            "batch_k": args.batch,
            "batch_total_s": round(t_batch, 4),
            "device_s_est": round(dev_est, 4),
            "ref_best_s": REF_BEST.get(name),
        }
        out["cases"][name] = row
        print(f"{name}: wall {wall*1e3:.1f} ms "
              f"(min {np.min(walls)*1e3:.1f} / max {np.max(walls)*1e3:.1f}), "
              f"device est {dev_est*1e3:.1f} ms, "
              f"batch{args.batch} {t_batch*1e3:.1f} ms", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
