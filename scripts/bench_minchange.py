#!/usr/bin/env python
"""min_change accuracy knob at the big-C warm-start floor (NEXT.md #3).

The tuned warm preset (warm_start_points=4e6 / wsc=2000) reaches the
min_change=1.0 2-iteration floor (~22 s) at a measured ~5e-3 |dH| drift
from the cold optimum — the reference's relative convergence criterion
(/root/reference/python/simpleicp/simpleicp.py:355-379) stops while
refinement is still converging. This experiment measures the knob the
criterion exposes: does tightening min_change at the tuned corner buy the
drift back, and at what cost in full-resolution iterations (~5.5 s of
device sweep each, profile_trace_r5.json)?

Variants (C=1e5 x 12.5M tiled-dragon, true misalignment, chunked exact):
  cold        — min_change=1.0, no warm start: the drift anchor (~48 s);
  cold_tight  — min_change=0.1 cold: the criterion's own residual motion
                (how far the DEFAULT stop is from a tight stop);
  tuned @ min_change in {1.0, 0.3, 0.1} — the knob under test.

Timing per CLAUDE.md: device-resident inputs, perturbed repeats, forced
readback, compile pass first, health probe before each timed rep.
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
    ap.add_argument("--cold-repeats", type=int, default=1)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--probe-budget", type=float, default=1200.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_bigc import tile_cloud
    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models.icp import icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    N, C = int(args.n), args.c
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X1 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), dtype)
    X2 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), dtype)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    X_fix = jax.block_until_ready(tile_cloud(X1, N, ext * 1.05))
    X_mov = jax.block_until_ready(tile_cloud(X2, N, ext * 1.05))

    def cfg(mc, warm):
        kw = dict(correspondences=C, min_change=mc)
        if warm:
            kw.update(warm_start=True, warm_start_points=4_000_000,
                      warm_start_correspondences=2000)
        return IcpConfig(**kw)

    variants = [
        ("cold", cfg(1.0, warm=False), args.cold_repeats),
        ("cold_tight", cfg(0.1, warm=False), args.cold_repeats),
        ("tuned_mc1.0", cfg(1.0, warm=True), args.repeats),
        ("tuned_mc0.3", cfg(0.3, warm=True), args.repeats),
        ("tuned_mc0.1", cfg(0.1, warm=True), args.repeats),
    ]

    rng = np.random.default_rng(0)
    out = {"n_points": N, "correspondences": C,
           "backend": jax.default_backend(), "variants": {}}
    H_by_variant = {}
    for tag, c, reps in variants:
        print(f"[{tag}] compile pass", flush=True)
        probe_until_healthy(args.probe_timeout, args.probe_budget)
        res = icp_register(X_fix, X_mov, c)
        np.asarray(res.H)
        assert int(res.error_code) == 0, tag
        times, iters = [], []
        for rep in range(reps):
            probe_until_healthy(args.probe_timeout, args.probe_budget)
            Xm_i = jax.block_until_ready(
                X_mov + jnp.asarray(
                    rng.uniform(-1e-7, 1e-7, (1, 3)), dtype))
            t0 = time.perf_counter()
            res = icp_register(X_fix, Xm_i, c)
            np.asarray(res.H)
            dt = time.perf_counter() - t0
            times.append(round(dt, 2))
            iters.append(int(res.n_iterations))
            print(f"  [{tag}] rep {rep}: {dt:.2f} s, "
                  f"{int(res.n_iterations)} full-res iterations", flush=True)
        H_by_variant[tag] = np.asarray(res.H)
        out["variants"][tag] = {
            "min_change": c.min_change,
            "warm_start": c.warm_start,
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
