#!/usr/bin/env python
"""Profiler-backed device-time attribution (round-4 verdict item 3).

Captures `jax.profiler` perfetto traces (device TPU lanes ARE collected
through the tunnel — verified: the trace carries a `/device:TPU:0` process
with 'XLA Ops' / 'XLA Modules' threads) and turns them into:

  * a per-kernel device-time table for (a) the dragon default registration
    and (b) the big-C chunked headline's per-iteration chunk program;
  * total device seconds per registration — the MEASURED replacement for
    the round-4 pipelined-batch arithmetic estimates (audit_small_r4.json
    `device_s_est`);
  * achieved VPU utilization of the in-loop match sweep against an
    EMPIRICAL attainable-peak denominator: a fused x*x+c chain (2 f32
    VPU flops/element/step, no memory traffic beyond one array) measured
    in the same session — a spec sheet cannot drift, and the scaling-book
    peak (8x128 lanes x 4 ALUs x clock) is not fetchable from this
    environment, so the denominator is measured, cited, and reproducible.

Usage:
  python scripts/profile_trace.py --cases vpu,dragon,bigc --out FILE.json

Methodology notes:
  * every case runs compile-first, then traces only perturbed re-runs
    (compile inside a trace would conflate remote-compile time — the
    round-3 calibration lesson);
  * per-op times aggregate the 'XLA Ops' thread of the device process and
    divide by the number of traced repetitions;
  * 'XLA Modules' totals give whole-program device residency per launch.
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_trace(logdir):
    """Aggregate the newest perfetto trace under logdir.

    Returns (ops, modules): op/module name -> {"us": total, "count": n}
    over the device (TPU) process."""
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = {p for p, n in pnames.items() if "TPU" in n or "device" in n}
    ops = defaultdict(lambda: {"us": 0.0, "count": 0})
    modules = defaultdict(lambda: {"us": 0.0, "count": 0})
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        thread = tnames.get((e["pid"], e["tid"]), "")
        if thread == "XLA Ops":
            d = ops[e["name"]]
        elif thread == "XLA Modules":
            d = modules[e["name"].split("(")[0]]
        else:
            continue
        d["us"] += e.get("dur", 0.0)
        d["count"] += 1
    return dict(ops), dict(modules)


def _traced(logdir, fn):
    import jax

    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        fn()
    finally:
        jax.profiler.stop_trace()
    return _parse_trace(logdir)


def _op_table(ops, n_reps, top=12):
    """Top ops by device time. NOTE: `while` op rows SPAN their body's ops
    (the trace nests them), so summing this table double-counts loop
    bodies — whole-program device time comes from the 'XLA Modules' lane
    totals, which measure each launch's device residency exactly once."""
    rows = [
        {
            "op": name,
            "device_us_per_run": round(d["us"] / n_reps, 1),
            "calls_per_run": d["count"] // n_reps,
        }
        for name, d in ops.items()
    ]
    rows.sort(key=lambda r: -r["device_us_per_run"])
    return rows[:top]


def case_vpu(out, args):
    """Empirical attainable VPU f32 throughput: K fused x*x+c steps over an
    HBM-resident array large enough to bound launch overhead, sized so the
    chain (not bandwidth) dominates: 2*K flops per 4-byte element read+
    written once => arithmetic intensity K/4 flop/byte, far past the ~0.24
    flop/byte v5e ridge at K=256."""
    import jax
    import jax.numpy as jnp

    n, K = 1 << 24, 256

    @jax.jit
    def chain(x):
        c = jnp.float32(0.25)
        for _ in range(K):
            x = x * x + c
        return x

    x = jnp.full((n,), 0.3, jnp.float32)
    jax.block_until_ready(chain(x))  # compile
    reps = 5
    ops_tab, _ = _traced(args.logdir + "/vpu", lambda: [
        jax.block_until_ready(chain(x + np.float32(1e-6 * i)))
        for i in range(reps)
    ])
    # the chain compiles to ONE dominant fusion; take it alone so the
    # input-perturbation add (a separate bandwidth-bound op) does not
    # dilute the compute-bound measurement
    dev_us = max(d["us"] for d in ops_tab.values()) / reps
    flops = 2.0 * K * n
    peak = flops / (dev_us * 1e-6)
    out["vpu_attainable"] = {
        "elements": n, "chain_steps": K, "flops_per_run": flops,
        "device_us_per_run": round(dev_us, 1),
        "f32_flops_per_sec": float(f"{peak:.4g}"),
        "note": "fused x*x+c chain, 2 f32 VPU flops/element/step; "
                "measured on-device via the profiler trace",
    }
    print(json.dumps(out["vpu_attainable"]), flush=True)


def _case_small(name):
    """Per-dataset device-time measurement for the reference-sized configs
    (dataset kwargs shared with scripts/benchmark.py DATASETS)."""

    def run_case(out, args):
        import jax
        import jax.numpy as jnp

        from benchmark import load_dataset
        from simpleicp_tpu.models.icp import icp_register

        # single source of truth for the dataset kwargs contract
        # (synth tiling, degree->radian observations): benchmark.py
        X_fix, X_mov, cfg, obs_vals, obs_w = load_dataset(name)

        def go(Xm):
            return icp_register(X_fix, Xm, cfg,
                                rbp_observed_values=obs_vals,
                                rbp_observation_weights=obs_w)

        res = go(X_mov)  # compile
        np.asarray(res.H)
        assert int(res.error_code) == 0

        rng = np.random.default_rng(0)
        reps = 5
        jitters = [
            jax.block_until_ready(
                X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)),
                                    jnp.float32))
            for _ in range(reps)
        ]

        def run():
            for Xm in jitters:
                np.asarray(go(Xm).H)

        ops_tab, modules = _traced(args.logdir + f"/{name}", run)
        table = _op_table(ops_tab, reps)
        out[name] = {
            "n_reps": reps,
            "iterations": int(res.n_iterations),
            "per_op_device_us": table,
            # authoritative: each launch's device residency, counted once
            "total_device_us_per_registration": round(
                sum(v["us"] for v in modules.values()) / reps, 1),
            "module_totals_us": {
                k: round(v["us"] / reps, 1) for k, v in modules.items()
            },
        }
        print(json.dumps(out[name], indent=1), flush=True)

    return run_case


def case_dragon_prepared(out, args):
    """Device time of the PREPARED dragon registration (prepare_fixed
    consumed): the serving path's per-scan program. The self-contained
    dragon program measured 9.47 ms with the prologue kNN fusion at
    4.20 ms of it (profile_trace_r5.json); with the preparation that
    fusion moves to the one-time prepare_fixed, so the per-scan residency
    should drop to roughly the loop + epilogue."""
    import jax
    import jax.numpy as jnp

    from benchmark import load_dataset
    from simpleicp_tpu.models.icp import icp_register, prepare_fixed

    X_fix, X_mov, cfg, obs_vals, obs_w = load_dataset("dragon")
    prep = prepare_fixed(X_fix, cfg)
    jax.block_until_ready(prep.normals)

    def go(Xm):
        return icp_register(X_fix, Xm, cfg, fixed_prep=prep,
                            rbp_observed_values=obs_vals,
                            rbp_observation_weights=obs_w)

    res = go(X_mov)  # compile
    np.asarray(res.H)
    assert int(res.error_code) == 0

    rng = np.random.default_rng(0)
    reps = 5
    jitters = [
        jax.block_until_ready(
            X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)),
                                jnp.float32))
        for _ in range(reps)
    ]

    def run():
        for Xm in jitters:
            np.asarray(go(Xm).H)

    ops_tab, modules = _traced(args.logdir + "/dragon_prepared", run)
    out["dragon_prepared"] = {
        "n_reps": reps,
        "iterations": int(res.n_iterations),
        "per_op_device_us": _op_table(ops_tab, reps),
        "total_device_us_per_registration": round(
            sum(v["us"] for v in modules.values()) / reps, 1),
        "module_totals_us": {
            k: round(v["us"] / reps, 1) for k, v in modules.items()
        },
    }
    print(json.dumps(out["dragon_prepared"], indent=1), flush=True)


def case_bigc(out, args):
    """One chunk program of the big-C headline (C=1e5 x 12.5M ungated
    exact): per-iteration device time attribution of the match sweep. The
    full headline is host-chunked; the ITERATION cost is what the roofline
    claim (2.26e11 pairs/s) prices, so the chunk program is the trace
    target. Uses chunk_iterations=1 so one traced launch = one iteration."""
    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models.icp import icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    # SAME tiling as the headline benchmark this trace attributes
    # (bench_bigc.py main; also used by bench_warm_cascade and
    # record_stall_policy) — one tiling implementation, one geometry.
    from bench_bigc import tile_cloud

    n = args.bigc_points
    C = 100_000
    X1 = jnp.asarray(read_xyz("/root/reference/data/dragon1.xyz"),
                     jnp.float32)
    X2 = jnp.asarray(read_xyz("/root/reference/data/dragon2.xyz"),
                     jnp.float32)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    Xf = jax.block_until_ready(tile_cloud(X1, n, ext * 1.05))
    Xm = jax.block_until_ready(tile_cloud(X2, n, ext * 1.05))
    cfg = IcpConfig(correspondences=C, dispatch="chunked",
                    chunk_iterations=1, max_iterations=args.bigc_iters)
    res = icp_register(Xf, Xm, cfg)  # compile + warm the whole cascade
    np.asarray(res.H)
    assert int(res.error_code) == 0
    iters = int(res.n_iterations)

    def run():
        r = icp_register(Xf, Xm + jnp.float32(1e-6), cfg)
        np.asarray(r.H)

    ops_tab, modules = _traced(args.logdir + "/bigc", run)
    # Whole-run totals (ONE traced registration): ops inside the match
    # scan fire once per scan step, so per-iteration numbers come from
    # totals / iterations, not per-event durations. The top op by total
    # device time is the in-loop match fusion (the prologue's grid/sort
    # ops have distinct names and an order less total time).
    table = _op_table(ops_tab, 1, top=16)
    match_us_total = table[0]["device_us_per_run"] if table else 0.0
    pairs_total = float(C) * n * max(iters, 1)
    out["bigc"] = {
        "points": n, "correspondences": C, "iterations": iters,
        "per_op_device_us_whole_run": table,
        "total_device_us_whole_run": round(
            sum(v["us"] for v in modules.values()), 1),
        "match_device_s_per_iteration": round(
            match_us_total * 1e-6 / max(iters, 1), 3),
        "module_launches_us": {
            k_: {"us": round(v["us"], 1), "count": v["count"]}
            for k_, v in modules.items()
        },
        "match_pairs_whole_run": pairs_total,
        "achieved_pairs_per_sec_top_op": float(
            f"{pairs_total / (match_us_total * 1e-6):.4g}"
        ) if match_us_total else None,
    }
    print(json.dumps(out["bigc"], indent=1), flush=True)


def case_gated(out, args):
    """Device-time attribution of the gated scale engine (dilated-occupancy
    gate + registration) at 12.5M x 12.5M, radius 1.0 — the
    gated_scale_r5.json 6.8 s headline row's program mix."""
    import jax
    import jax.numpy as jnp

    from bench_gated_scale import tile_cloud
    from simpleicp_tpu import IcpConfig, icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    n = 12_500_000
    X_fix0 = read_xyz("/root/reference/data/dragon1.xyz").astype(np.float32)
    X_mov0 = read_xyz("/root/reference/data/dragon2.xyz").astype(np.float32)
    spacing = float(X_fix0[:, 0].max() - X_fix0[:, 0].min()) * 1.05
    Xf = tile_cloud(X_fix0, n, spacing)
    Xm = tile_cloud(X_mov0, n, spacing)
    cfg = IcpConfig(max_overlap_distance=1.0)
    res = icp_register(Xf, Xm, cfg)  # compile + host-side planning warm
    np.asarray(res.H)
    assert int(res.error_code) == 0

    import jax.numpy as _j

    Xm_d = jax.device_put(_j.asarray(Xm))

    def run():
        r = icp_register(Xf, jax.block_until_ready(Xm_d + _j.float32(1e-7)),
                         cfg)
        np.asarray(r.H)

    ops_tab, modules = _traced(args.logdir + "/gated", run)
    table = _op_table(ops_tab, 1, top=14)
    out["gated_12p5m"] = {
        "points": n, "iterations": int(res.n_iterations),
        "per_op_device_us_whole_run": table,
        "total_device_us_whole_run": round(
            sum(v["us"] for v in modules.values()), 1),
        "module_launches_us": {
            k: {"us": round(v["us"], 1), "count": v["count"]}
            for k, v in modules.items()
        },
    }
    print(json.dumps(out["gated_12p5m"], indent=1), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="vpu,dragon")
    ap.add_argument("--out", default="")
    ap.add_argument("--logdir", default="/tmp/simpleicp_trace")
    ap.add_argument("--bigc-points", type=int, default=12_500_000)
    ap.add_argument("--bigc-iters", type=int, default=3,
                    help="cap big-C iterations (each is ~5.5 s of device "
                         "sweep; 3 is enough for per-iteration attribution)")
    args = ap.parse_args()

    out = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "cases": args.cases}
    import jax

    out["backend"] = jax.default_backend()
    cases = {"vpu": case_vpu, "bigc": case_bigc, "gated": case_gated,
             "dragon_prepared": case_dragon_prepared}
    for ds in ("dragon", "bunny", "multisensor", "webots",
               "airborne", "terrestrial"):
        cases[ds] = _case_small(ds)
    for case in args.cases.split(","):
        t0 = time.perf_counter()
        cases[case](out, args)
        print(f"[{case}] done in {time.perf_counter() - t0:.1f} s",
              flush=True)

    # utilization roll-up when both halves are present
    if "vpu_attainable" in out and "bigc" in out and (
            out["bigc"]["achieved_pairs_per_sec_top_op"]):
        peak = out["vpu_attainable"]["f32_flops_per_sec"]
        pps = out["bigc"]["achieved_pairs_per_sec_top_op"]
        # kernel op count per pair (BENCHMARKS.md roofline): 3 sub + 3 mul
        # + 2 add for d^2, validity select, running-min cmp, argmin
        # cmp+select ~= 12 f32 VPU ops
        out["utilization"] = {
            "ops_per_pair_model": 12,
            "achieved_vpu_ops_per_sec": float(f"{pps * 12:.4g}"),
            "attainable_vpu_flops_per_sec": peak,
            "fraction_of_attainable": round(pps * 12 / peak, 3),
        }
        print(json.dumps(out["utilization"]), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
