#!/usr/bin/env python
"""Cross-dataset benchmark harness.

Mirrors the reference's /root/reference/scripts/benchmark.sh: runs every
dataset with its canonical parameters (/root/reference/scripts/benchmark.sh:28-31),
times the algorithm (excluding compilation, matching the reference's
`Finished in N.NNN seconds!` scope which excludes interpreter startup), and
emits a paste-ready Markdown table plus a JSON artifact.

Usage:
  python scripts/benchmark.py [--datasets dragon,bunny,...] [--repeats 3]
                              [--out benchmarks.json] [--sharded N]
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

# dataset -> (fixed, movable, kwargs); parameters per the reference harness.
# airborne/terrestrial xyz files are absent from the reference snapshot
# (/root/reference/.MISSING_LARGE_BLOBS) — entries prefixed "synth:" tile the
# dragon pair on device to the README row counts (1340k / 1250k pts,
# /root/reference/README.md:173-174).
DATASETS = {
    "dragon": ("dragon1.xyz", "dragon2.xyz", {}),
    "airborne": ("synth:1340000", "synth:1340000", {}),
    "terrestrial": ("synth:1250000", "synth:1250000", {}),
    "bunny": ("bunny_part1.xyz", "bunny_part2.xyz", {"max_overlap_distance": 1.0}),
    "multisensor": (
        "multisensor_lidar.xyz",
        "multisensor_radar.xyz",
        {
            "max_overlap_distance": 1.0,
            "rbp_observed_values": (-0.5, 0.0, 0.0, 0.0, 0.0, 0.0),
            "rbp_observation_weights": (math.inf, math.inf, 0.0, 0.0, 0.0, 0.0),
        },
    ),
    "webots": (
        "webots1.xyz",
        "webots2.xyz",
        {
            "neighbors": 40,
            "max_overlap_distance": 0.5,
            "rbp_observed_values": (0.0, 0.0, -60.0, -0.05, -0.09, 0.0),
            "rbp_observation_weights": (0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        },
    ),
}

# Reference runtimes (seconds) from /root/reference/README.md:183-186 for
# datasets that have published rows (best implementation + python).
REFERENCE_BEST = {"dragon": 0.07, "bunny": 0.05, "airborne": 1.62,
                  "terrestrial": 1.58}
REFERENCE_PYTHON = {"dragon": 1.86, "bunny": 2.15, "airborne": 7.48,
                    "terrestrial": 8.15}


def load_dataset(name):
    """Device-resident clouds + prepared config/observations for a DATASETS
    entry — the single place that knows the kwargs contract (synth: tiling,
    degree->radian observation conversion, weight extraction). Shared by
    this sweep and scripts/profile_trace.py so the two can never diverge.

    Returns (X_fix, X_mov, cfg, obs_vals, obs_w)."""
    import jax
    import jax.numpy as jnp

    from simpleicp_tpu.config import IcpConfig
    from simpleicp_tpu.utils.xyz_io import read_xyz

    fixed, movable, kw = DATASETS[name]
    if fixed.startswith("synth:"):
        from bench_scale import tile_cloud

        n = int(fixed.split(":")[1])
        base_f = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), jnp.float32)
        base_m = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), jnp.float32)
        spacing = float(jnp.max(base_f[:, 0]) - jnp.min(base_f[:, 0])) * 1.05
        X_fix = tile_cloud(base_f, n, spacing)
        X_mov = tile_cloud(base_m, n, spacing)
        jax.block_until_ready((X_fix, X_mov))
    else:
        # device-resident inputs (the HBM analog of the reference's in-RAM
        # data; transfers through the test tunnel are harness artifacts)
        X_fix = jnp.asarray(read_xyz(f"{DATA}/{fixed}"), jnp.float32)
        X_mov = jnp.asarray(read_xyz(f"{DATA}/{movable}"), jnp.float32)
        jax.block_until_ready((X_fix, X_mov))

    kw = dict(kw)
    obs_vals = np.array(kw.pop("rbp_observed_values", (0.0,) * 6),
                        dtype=np.float64)
    obs_vals[:3] = np.deg2rad(obs_vals[:3])
    obs_w = np.array(kw.pop("rbp_observation_weights", (0.0,) * 6),
                     dtype=np.float64)
    return X_fix, X_mov, IcpConfig(**kw), obs_vals, obs_w


def run_dataset(name, repeats, sharded=0):
    import jax

    from simpleicp_tpu.models.icp import icp_register

    import jax.numpy as jnp

    X_fix, X_mov, cfg, obs_vals, obs_w = load_dataset(name)

    if sharded:
        from simpleicp_tpu.parallel import icp_register_sharded, make_mesh

        mesh = make_mesh(sharded)

        def go(Xm=X_mov):
            return icp_register_sharded(
                X_fix, Xm, cfg, mesh=mesh,
                rbp_observed_values=obs_vals, rbp_observation_weights=obs_w,
            )
    else:
        def go(Xm=X_mov):
            return icp_register(
                X_fix, Xm, cfg,
                rbp_observed_values=obs_vals, rbp_observation_weights=obs_w,
            )

    res = go()  # compile
    jax.block_until_ready(res.H)
    if int(res.error_code) != 0:
        raise RuntimeError(f"{name}: error_code={int(res.error_code)}")

    # Perturbed inputs between repeats (CLAUDE.md timing methodology):
    # a fresh 1e-7 jitter defeats any result caching while leaving
    # convergence behavior unchanged.
    rng = np.random.default_rng(0)
    times = []
    for _ in range(repeats):
        X_mov_i = jax.block_until_ready(
            X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)), X_mov.dtype)
        )
        t0 = time.perf_counter()
        res = go(X_mov_i)
        _ = np.asarray(res.H)  # forced readback guarantees completion
        times.append(time.perf_counter() - t0)

    n = int(res.n_iterations)
    return {
        "dataset": name,
        "n_fix": int(X_fix.shape[0]),
        "n_mov": int(X_mov.shape[0]),
        "seconds": float(np.median(times)),
        "seconds_min": float(np.min(times)),
        "seconds_max": float(np.max(times)),
        "repeats": len(times),
        "iterations": n,
        "converged": bool(res.converged),
        "final_std": float(np.asarray(res.iter_stds)[n - 1]),
        "ref_best_s": REFERENCE_BEST.get(name),
        "ref_python_s": REFERENCE_PYTHON.get(name),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", default=",".join(DATASETS))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--sharded", type=int, default=0)
    args = ap.parse_args()

    import jax

    rows = []
    for name in args.datasets.split(","):
        rows.append(run_dataset(name.strip(), args.repeats, args.sharded))
        r = rows[-1]
        print(
            f"{name}: {r['seconds']:.4f}s, {r['iterations']} iters, "
            f"std {r['final_std']:.5f}",
            flush=True,
        )

    plat = jax.devices()[0].platform
    print(f"\n| Dataset | points | {plat} time | iters | ref best | speedup |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        best = r["ref_best_s"]
        speed = f"{best / r['seconds']:.2f}x" if best else "-"
        best_s = f"{best:.2f}s" if best else "-"
        print(
            f"| {r['dataset']} | {r['n_fix']}/{r['n_mov']} | "
            f"{r['seconds']:.3f}s | {r['iterations']} | {best_s} | {speed} |"
        )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
