#!/usr/bin/env python
"""Fixed-cloud preparation reuse (prepare_fixed) on hardware: the serving
workload — many movable clouds against ONE fixed map — pays the
movable-independent prologue once.

What the prep skips, per the round-5 profiler traces
(profile_trace_r5.json): dragon's prologue kNN fusion is 4.20 ms of its
9.47 ms device time; the big-C headline's certified grid-kNN prologue is
~10 s of its ~22 s tuned-warm floor.

Cases:
  small  — dragon default: single-registration latency and pipelined-8
           serving throughput, prep vs self-contained (same protocol as
           bench_serving_batch.py's pipelined comparator);
  bigc   — C=1e5 x 12.5M tiled-dragon tuned warm start (the ~22 s floor,
           warm_cascade_r5.json): tuned vs tuned+prep, plus the one-time
           prepare_fixed cost.

Timing per CLAUDE.md: device-resident inputs, compile pass first,
perturbed repeats, forced readback, health probe before timed reps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"


def probe_until_healthy(timeout_s, budget_s):
    from simpleicp_tpu.utils.device_policy import probe_until_healthy as p

    return p(timeout_s, budget_s)


def bench_small(args, out):
    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register, prepare_fixed
    from simpleicp_tpu.utils.xyz_io import read_xyz

    X_fix = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), jnp.float32)
    X_mov = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), jnp.float32)
    jax.block_until_ready((X_fix, X_mov))
    cfg = IcpConfig()
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    prep = prepare_fixed(X_fix, cfg)
    jax.block_until_ready(prep.normals)
    prep_s = time.perf_counter() - t0  # includes compile on first process

    def perturbed():
        return jax.block_until_ready(
            X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)),
                                jnp.float32))

    res = {}
    for tag, kw in (("self_contained", {}), ("prepared", {"fixed_prep": prep})):
        r0 = icp_register(X_fix, X_mov, cfg, **kw)  # compile
        np.asarray(r0.H)
        assert int(r0.error_code) == 0
        # single-registration latency
        times = []
        for _ in range(args.repeats):
            Xm_i = perturbed()
            t0 = time.perf_counter()
            r = icp_register(X_fix, Xm_i, cfg, **kw)
            np.asarray(r.H)
            times.append(time.perf_counter() - t0)
            assert int(r.error_code) == 0
        # pipelined-8 serving throughput (async enqueue, one readback pass)
        B = 8
        ptimes = []
        for _ in range(args.repeats):
            Xms = [perturbed() for _ in range(B)]
            t0 = time.perf_counter()
            rs = [icp_register(X_fix, Xm, cfg, **kw) for Xm in Xms]
            for r in rs:
                np.asarray(r.H)
            ptimes.append(time.perf_counter() - t0)
            assert all(int(r.error_code) == 0 for r in rs)
        res[tag] = {
            "single_seconds_median": round(float(np.median(times)), 4),
            "single_seconds_all": [round(t, 4) for t in times],
            "pipelined8_seconds_all": [round(t, 4) for t in ptimes],
            "pipelined8_reg_per_sec": round(
                B / float(np.median(ptimes)), 1),
        }
        print(f"  [{tag}] single {res[tag]['single_seconds_median']*1e3:.1f}"
              f" ms, pipelined {res[tag]['pipelined8_reg_per_sec']} reg/s",
              flush=True)
    out["small"] = {
        "dataset": "dragon", "prepare_seconds_incl_compile": round(prep_s, 3),
        **res,
    }


def bench_bigc(args, out):
    import jax
    import jax.numpy as jnp

    from bench_bigc import tile_cloud
    from simpleicp_tpu import IcpConfig, icp_register, prepare_fixed
    from simpleicp_tpu.utils.xyz_io import read_xyz

    N, C = int(args.n), args.c
    dtype = jnp.float32
    X1 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), dtype)
    X2 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), dtype)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    X_fix = jax.block_until_ready(tile_cloud(X1, N, ext * 1.05))
    X_mov = jax.block_until_ready(tile_cloud(X2, N, ext * 1.05))

    cfg = IcpConfig(correspondences=C, warm_start=True,
                    warm_start_points=4_000_000,
                    warm_start_correspondences=2000)

    probe_until_healthy(args.probe_timeout, args.probe_budget)
    t0 = time.perf_counter()
    prep = prepare_fixed(X_fix, cfg)
    jax.block_until_ready(prep.normals)
    prep_cold_s = time.perf_counter() - t0
    # warm prepare (programs compiled): the steady-state cost of refreshing
    # a preparation
    t0 = time.perf_counter()
    prep = prepare_fixed(X_fix, cfg)
    jax.block_until_ready(prep.normals)
    prep_s = time.perf_counter() - t0
    print(f"  prepare_fixed: {prep_cold_s:.2f} s cold, {prep_s:.2f} s warm",
          flush=True)

    # tight-radius static-grid matcher variant: the warm seed lands the
    # full-resolution run near the basin, so a match_radius of ~7x the NN
    # spacing (the round-3 escape-hatch radius) bounds every true NN and
    # the grid's O(27*cap) gathers replace the 5.5 s brute sweep
    # (~1.9 s/iteration measured at cap~25, bigc_tpu_r4.json grid row)
    import dataclasses

    cfg_grid = dataclasses.replace(cfg, match_method="grid",
                                   match_radius=args.grid_radius)

    rng = np.random.default_rng(0)
    res = {}
    H_by = {}
    for tag, c_, kw in (
        ("tuned", cfg, {}),
        ("tuned_prep", cfg, {"fixed_prep": prep}),
        ("tuned_prep_grid", cfg_grid, {"fixed_prep": prep}),
    ):
        print(f"[{tag}] compile pass", flush=True)
        probe_until_healthy(args.probe_timeout, args.probe_budget)
        r = icp_register(X_fix, X_mov, c_, **kw)
        np.asarray(r.H)
        assert int(r.error_code) == 0, tag
        times, iters = [], []
        for rep in range(args.bigc_repeats):
            probe_until_healthy(args.probe_timeout, args.probe_budget)
            Xm_i = jax.block_until_ready(
                X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)), dtype))
            t0 = time.perf_counter()
            r = icp_register(X_fix, Xm_i, c_, **kw)
            np.asarray(r.H)
            dt = time.perf_counter() - t0
            times.append(round(dt, 2))
            iters.append(int(r.n_iterations))
            print(f"  [{tag}] rep {rep}: {dt:.2f} s, "
                  f"{int(r.n_iterations)} full-res iterations", flush=True)
        H_by[tag] = np.asarray(r.H)
        res[tag] = {
            "seconds_all": times,
            "seconds_median": round(float(np.median(times)), 2),
            "full_res_iterations": iters,
            "converged": bool(r.converged),
        }
    out["bigc"] = {
        "n_points": N, "correspondences": C,
        "prepare_seconds_cold": round(prep_cold_s, 2),
        "prepare_seconds_warm": round(prep_s, 2),
        "max_H_diff_prep_vs_not": float(
            np.abs(H_by["tuned"] - H_by["tuned_prep"]).max()),
        "max_H_diff_grid_vs_prep": float(
            np.abs(H_by["tuned_prep_grid"] - H_by["tuned_prep"]).max()),
        "grid_radius": args.grid_radius,
        **res,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="small,bigc")
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--bigc-repeats", type=int, default=2)
    ap.add_argument("--grid-radius", type=float, default=0.05)
    ap.add_argument("--n", type=float, default=12.5e6)
    ap.add_argument("--c", type=int, default=100_000)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--probe-budget", type=float, default=1200.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    out = {"backend": jax.default_backend()}
    cases = args.cases.split(",")
    if "small" in cases:
        probe_until_healthy(args.probe_timeout, args.probe_budget)
        bench_small(args, out)
    if "bigc" in cases:
        bench_bigc(args, out)
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
