#!/usr/bin/env python
"""GATED large-scale registration benchmark — the round-1 failure case.

Round 1: the hash-grid gate's 27 x cap per-query gathers made a
12.5M-query gated program run ~7 minutes of pure gather time, and the
runtime watchdog killed the worker (BENCHMARKS.md "Grid gate at scale").
Round 2: gate_method auto now routes huge gated runs through the
dilated-occupancy gate (ops/dilate_gate.py — scatter + vectorized rolls +
one gather per query + exact band resolution on a small subset).

Usage: python scripts/bench_gated_scale.py [--sizes 1.34e6,12.5e6] [--radius 1.0]
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
    """Tile on the HOST (numpy): clouds in the gated scenario are
    host-origin (loaded from disk in the real user flow), which lets the
    dilate gate pack occupancy from the host copy with no device fetch."""
    X = np.asarray(X, np.float32)
    n = X.shape[0]
    times = -(-n_target // n)
    k = math.ceil(times ** (1.0 / 3.0))
    ii = np.arange(k * k * k, dtype=np.float32)[:times]
    off = np.stack([ii % k, (ii // k) % k, ii // (k * k)], axis=1) * spacing
    tiled = (X[None, :, :] + off[:, None, :]).reshape(-1, 3)
    return tiled[:n_target]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1.34e6,12.5e6")
    ap.add_argument("--radius", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--probe-budget", type=float, default=3600.0)
    ap.add_argument(
        "--probe-timeout", type=float, default=240.0,
        help="per-size health-probe timeout (0 disables; a degraded "
             "worker window makes scale rows garbage — round-3 verdict "
             "recorded 12.8-21.6 s spread for identical 50M work)",
    )
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from simpleicp_tpu.utils.device_policy import probe_default_backend

    # Probe BEFORE the first in-process device touch: a stalled worker
    # hangs jnp.asarray uninterruptibly (CLAUDE.md) and no later probe can
    # save the process. Retry until the worker answers or the budget runs
    # out.
    if args.probe_timeout > 0:
        deadline0 = time.monotonic() + args.probe_budget
        while True:
            status0, _b0, psec0 = probe_default_backend(args.probe_timeout)
            print(f"probe[preflight]: {status0} in {psec0:.1f} s",
                  flush=True)
            if status0 == "ok" or time.monotonic() > deadline0:
                break
            time.sleep(60)
        if status0 != "ok":
            print("worker did not answer the pre-flight probe within the "
                  "budget; aborting with no measurement", flush=True)
            return 1

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    X_fix0 = read_xyz(f"{DATA}/dragon1.xyz").astype(np.float32)
    X_mov0 = read_xyz(f"{DATA}/dragon2.xyz").astype(np.float32)
    extent = float(X_fix0[:, 0].max() - X_fix0[:, 0].min())
    spacing = extent * 1.05

    rows = []
    for size_s in args.sizes.split(","):
        n = int(float(size_s))
        if args.probe_timeout > 0:
            # retry until the worker answers (degraded windows last
            # 30-60+ min after big jobs; a row measured inside one is
            # garbage) — bounded by --probe-budget
            deadline = time.monotonic() + args.probe_budget
            attempt = 0
            while True:
                attempt += 1
                status, _b, psec = probe_default_backend(args.probe_timeout)
                print(f"probe[{n}] attempt {attempt}: {status} in "
                      f"{psec:.1f} s", flush=True)
                if status == "ok" or time.monotonic() > deadline:
                    break
                time.sleep(60)
            probe = {"status": status, "seconds": round(psec, 2),
                     "attempts": attempt, "healthy": status == "ok"}
        else:
            probe = {"status": "skipped", "seconds": 0.0, "healthy": True}
        Xf = tile_cloud(X_fix0, n, spacing)
        Xm = tile_cloud(X_mov0, n, spacing)
        cfg = IcpConfig(max_overlap_distance=args.radius)

        t0 = time.perf_counter()
        res = icp_register(Xf, Xm, cfg)
        H = np.asarray(res.H)
        first = time.perf_counter() - t0
        assert int(res.error_code) == 0, f"error {int(res.error_code)} at n={n}"

        # Timed repeats follow bench.py's methodology: inputs resident in
        # HBM (the reference's "data already in RAM"), fresh perturbation
        # each repeat, forced H readback. The one-time host->device upload
        # is measured separately (isolated uploads run at 1.2-1.5 GB/s;
        # interleaved with registration state they can stall far below
        # that, which is a tunnel/runtime artifact, not algorithm time).
        Xf_d = jax.block_until_ready(jnp.asarray(Xf, jnp.float32))
        t0 = time.perf_counter()
        Xm_d = jax.block_until_ready(jnp.asarray(Xm, jnp.float32))
        upload = time.perf_counter() - t0
        # Adaptive retry (round-4): the worker oscillates between healthy
        # windows and 2-13x degraded windows MID-row. A rep far above the
        # best rep so far is re-measured once after the worker answers a
        # fresh probe; stalled samples stay recorded (gated_seconds_raw)
        # but the published median is over clean reps only.
        times, raw, replaced = [], [], []
        jit_i = 0
        for i in range(args.repeats):
            attempts = 0
            while True:
                attempts += 1
                jit_i += 1
                Xm_i = jax.block_until_ready(
                    Xm_d + jnp.float32(1e-7 * jit_i))
                t0 = time.perf_counter()
                H = np.asarray(icp_register(Xf_d, Xm_i, cfg).H)
                dt = time.perf_counter() - t0
                raw.append(round(dt, 4))
                stalled = (times and dt > 3.0 * min(times)
                           and args.probe_timeout > 0 and attempts == 1)
                if not stalled:
                    times.append(dt)
                    break
                print(f"  rep {i}: {dt:.1f} s vs best {min(times):.1f} s "
                      "— stalled window suspected, waiting for a healthy "
                      "probe and re-measuring once", flush=True)
                rdeadline = time.monotonic() + args.probe_budget
                while True:
                    st, _b2, ps2 = probe_default_backend(args.probe_timeout)
                    print(f"  retry probe: {st} in {ps2:.1f} s", flush=True)
                    if st == "ok" or time.monotonic() > rdeadline:
                        break
                    time.sleep(60)
                if st != "ok":
                    # worker never recovered within the budget: the stalled
                    # sample is the only measurement we can honestly take —
                    # keep it rather than re-measuring into the SAME window
                    # and publishing that as clean
                    print("  worker did not recover; keeping the stalled "
                          "sample", flush=True)
                    times.append(dt)
                    break
        # Post-pass outlier cleanup: the FIRST rep has no baseline, so a
        # stall there escapes the in-loop retry. If the spread still shows
        # a >3x outlier, re-measure it once after a healthy probe.
        if (args.probe_timeout > 0 and len(times) >= 2
                and max(times) > 3.0 * min(times)):
            print(f"  outlier cleanup: reps {sorted(round(x,1) for x in times)} "
                  "— re-measuring the outlier after a healthy probe",
                  flush=True)
            rdeadline = time.monotonic() + args.probe_budget
            while True:
                st, _b3, ps3 = probe_default_backend(args.probe_timeout)
                print(f"  cleanup probe: {st} in {ps3:.1f} s", flush=True)
                if st == "ok" or time.monotonic() > rdeadline:
                    break
                time.sleep(60)
            if st == "ok":
                jit_i += 1
                Xm_i = jax.block_until_ready(
                    Xm_d + jnp.float32(1e-7 * jit_i))
                t0 = time.perf_counter()
                H = np.asarray(icp_register(Xf_d, Xm_i, cfg).H)
                dt = time.perf_counter() - t0
                raw.append(round(dt, 4))
                ri = int(np.argmax(times))
                # provenance of the published median: record WHICH rep was
                # replaced and its original value (round-4 advisor — if the
                # re-measure itself lands in a degraded window, the swap
                # must be visible beyond gated_seconds_raw)
                replaced.append(
                    {"index": ri, "original": round(times[ri], 4),
                     "remeasured": round(dt, 4)}
                )
                times[ri] = dt
                print(f"  outlier re-measure: {dt:.1f} s", flush=True)
        t = float(np.median(times))
        rows.append({
            "n_points_per_cloud": n,
            "pairs": float(n) * n,
            "probe": probe, "healthy": probe["healthy"],
            "gated_seconds": round(t, 4),
            "gated_seconds_all": [round(x, 4) for x in times],
            "gated_seconds_raw": raw,
            "outlier_replacements": replaced,
            "gated_seconds_min": round(float(np.min(times)), 4),
            "gated_seconds_max": round(float(np.max(times)), 4),
            "upload_seconds_per_cloud": round(upload, 2),
            "first_run_seconds_incl_compile": round(first, 2),
            "iterations": int(res.n_iterations),
            "converged": bool(res.converged),
            "n_selected": int(np.asarray(res.sel_valid).sum()),
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
