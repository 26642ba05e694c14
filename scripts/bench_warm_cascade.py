#!/usr/bin/env python
"""Two-stage coarse cascade vs the tuned single warm-start pass at the
big-C headline (round-4 verdict item 5 / NEXT.md #3): does a cheap extra
coarse stage push the tuned 4M/2000 preset's ~22 s toward the 2-iteration
floor with less drift, or is ~22 s the floor?

Variants (C=1e5 x 12.5M tiled-dragon, true misalignment, chunked exact):
  cold     — optional baseline (--with-cold), known ~48 s healthy;
  tuned    — single coarse pass warm_start_points=4e6 / wsc=2000
             (the BENCHMARKS.md tuned preset, measured 21.9 s round 4);
  cascade  — stage 1: 1M/1000 coarse seeds stage 2: 4M/2000 coarse seeds
             the full run (plan_warm_start composes: the coarse pass
             accepts rbp_observed_values as ITS initial transform).

Timing per CLAUDE.md: device-resident inputs, perturbed repeats, forced
readback, compile pass first, health probe before each variant.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=12.5e6)
    ap.add_argument("--c", type=int, default=100_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--with-cold", action="store_true")
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--probe-budget", type=float, default=1200.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_bigc import tile_cloud
    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models.icp import icp_register, plan_warm_start
    from simpleicp_tpu.utils.xyz_io import read_xyz

    N, C = int(args.n), args.c
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X1 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), dtype)
    X2 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), dtype)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    X_fix = jax.block_until_ready(tile_cloud(X1, N, ext * 1.05))
    X_mov = jax.block_until_ready(tile_cloud(X2, N, ext * 1.05))

    cfg_cold = IcpConfig(correspondences=C)
    cfg_tuned = IcpConfig(correspondences=C, warm_start=True,
                          warm_start_points=4_000_000,
                          warm_start_correspondences=2000)

    def run_tuned(Xm):
        return icp_register(X_fix, Xm, cfg_tuned)

    def run_cascade(Xm):
        # stage 1: default 1M/1000 coarse pass -> seed
        c1, obs1 = plan_warm_start(
            X_fix, Xm,
            IcpConfig(correspondences=C, warm_start=True), dtype=dtype)
        # stage 2: sharp 4M/2000 coarse pass STARTING from the stage-1 seed
        c2, obs2 = plan_warm_start(
            X_fix, Xm, cfg_tuned, rbp_observed_values=obs1, dtype=dtype)
        return icp_register(X_fix, Xm, c2, rbp_observed_values=obs2)

    def run_cold(Xm):
        return icp_register(X_fix, Xm, cfg_cold)

    variants = [("tuned", run_tuned), ("cascade", run_cascade)]
    if args.with_cold:
        variants.append(("cold", run_cold))

    rng = np.random.default_rng(0)
    out = {"n_points": N, "correspondences": C,
           "backend": jax.default_backend(), "variants": {}}
    H_by_variant = {}
    for tag, fn in variants:
        print(f"[{tag}] compile pass", flush=True)
        probe_until_healthy(args.probe_timeout, args.probe_budget)
        res = fn(X_mov)
        np.asarray(res.H)
        assert int(res.error_code) == 0, tag
        times, iters = [], []
        for rep in range(args.repeats):
            probe_until_healthy(args.probe_timeout, args.probe_budget)
            Xm_i = jax.block_until_ready(
                X_mov + jnp.asarray(
                    rng.uniform(-1e-7, 1e-7, (1, 3)), dtype))
            t0 = time.perf_counter()
            res = fn(Xm_i)
            np.asarray(res.H)
            dt = time.perf_counter() - t0
            times.append(round(dt, 2))
            iters.append(int(res.n_iterations))
            print(f"  [{tag}] rep {rep}: {dt:.2f} s, "
                  f"{int(res.n_iterations)} full-res iterations",
                  flush=True)
        H_by_variant[tag] = np.asarray(res.H)
        out["variants"][tag] = {
            "seconds_all": times,
            "seconds_median": round(float(np.median(times)), 2),
            "full_res_iterations": iters,
            "converged": bool(res.converged),
            "H": np.asarray(res.H).tolist(),
        }
    for a in H_by_variant:
        for b in H_by_variant:
            if a < b:
                out[f"max_H_diff_{a}_vs_{b}"] = float(
                    np.abs(H_by_variant[a] - H_by_variant[b]).max())
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
