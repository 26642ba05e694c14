"""Command-line interface.

Flag names, short options, defaults, and semantics follow the reference CLIs
(/root/reference/c++/src/simpleicp-cli.cpp:15-35, /root/reference/rust/src/main.rs:10-46),
including "negative max_overlap_distance disables the gate". TPU-build
extensions: --solver, --export, --num-devices (sharded run), --device
(size-based CPU/accelerator routing, utils/device_policy.py),
--observed-values/--observation-weights (rbp observations, Python-API-only
in the reference).
"""

from __future__ import annotations

import argparse
import math
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="simpleicp-tpu",
        description="TPU-native point-to-plane ICP registration",
    )
    from . import __version__

    p.add_argument(
        "--version", action="version", version=f"%(prog)s {__version__}"
    )
    p.add_argument("-f", "--fixed", required=True, help="path of fixed point cloud (xyz)")
    p.add_argument("-m", "--movable", required=True, help="path of movable point cloud (xyz)")
    p.add_argument("-c", "--correspondences", type=int, default=1000)
    p.add_argument("-n", "--neighbors", type=int, default=10)
    p.add_argument("-p", "--min_planarity", type=float, default=0.3)
    p.add_argument(
        "-o", "--max_overlap_distance", type=float, default=-1.0,
        help="overlap gate radius; negative disables (reference contract)",
    )
    p.add_argument("-i", "--min_change", type=float, default=1.0)
    p.add_argument("-x", "--max_iterations", type=int, default=100)
    p.add_argument("--solver", choices=["nonlinear", "linearized"], default="nonlinear")
    p.add_argument(
        "--preset",
        choices=["python", "cpp", "rust", "julia", "matlab"],
        default=None,
        help="emulate one reference implementation's exact semantics: "
             "python = nonlinear solver, raw MAD (scale 1.0), planarity-first "
             "rejection, population std; cpp/rust = linearized solver, "
             "1.4826 MAD, joint rejection, sample std; julia/matlab = like "
             "rust but with their min_change=3 default (SURVEY.md "
             "Q1/Q3/Q5/Q8). A preset fixes --solver and --min_change; "
             "explicit --mad_scale/--rejection_staging/--std_ddof still "
             "override.",
    )
    p.add_argument(
        "--mad_scale", type=float, default=None,
        help="MAD-to-sigma scale of the rejection band (default 1.4826; "
             "reference Python uses 1.0)",
    )
    p.add_argument(
        "--rejection_staging", choices=["python", "joint"], default=None,
        help="outlier rejection staging: planarity-first (python) or joint "
             "(C++/Rust/Julia/MATLAB)",
    )
    p.add_argument(
        "--std_ddof", type=int, choices=[0, 1], default=None,
        help="ddof of the residual std for logging/convergence "
             "(0 = population like reference Python, 1 = sample like the "
             "native family)",
    )
    p.add_argument(
        "--observed-values", default=None, metavar="A1,A2,A3,TX,TY,TZ",
        help="rigid-body parameter observations (angles in DEGREES, like "
             "SimpleICP.run): six comma-separated values — doubles as the "
             "initial transform (TPU-build extension; the reference exposes "
             "this via the Python API only)",
    )
    p.add_argument(
        "--observation-weights", default=None, metavar="W1,...,W6",
        help="per-parameter observation weights: 0 free, finite>0 observed, "
             "inf frozen (use with --observed-values)",
    )
    p.add_argument("--export", default="", help="write the transformed movable cloud here")
    p.add_argument("--debug_dirpath", default="")
    p.add_argument(
        "--num-devices", type=int, default=0,
        help="shard the registration over this many devices (0 = single-chip)",
    )
    p.add_argument(
        "--device", choices=("auto", "cpu", "tpu"), default="auto",
        help="where to run: auto routes registrations estimated under "
             "~20 s of local CPU time to the CPU backend (skipping "
             "accelerator compile + dispatch latency) and everything "
             "else to the accelerator; cpu/tpu force a backend",
    )
    p.add_argument(
        "--approx-knn", action="store_true",
        help="hardware-assisted approximate kNN for normal estimation "
             "(TPU serving config; ~30%% faster, exact distances, "
             "~0.997 candidate recall)",
    )
    p.add_argument(
        "--gate-method", choices=("auto", "brute", "grid", "dilate"),
        default="auto",
        help="overlap-gate engine: dense sweep, spatial hash, or "
             "dilated-occupancy bitmap (auto picks by problem size)",
    )
    p.add_argument(
        "--match-method", choices=("auto", "brute", "grid"), default="auto",
        help="in-loop NN matcher: dense sweep (exact, unbounded) or "
             "static-grid cell list (exact within --match-radius; one grid "
             "build serves all iterations — for large --correspondences "
             "against big clouds); auto picks brute below ~2.7e11 matched "
             "pairs/iteration and grid above when a radius is available",
    )
    p.add_argument(
        "--match-radius", type=float, default=0.0,
        help="cell size / exactness radius of the grid matcher "
             "(0 = use --max_overlap_distance)",
    )
    p.add_argument(
        "--program-budget", type=float, default=30.0,
        help="single-program device-seconds budget on accelerator backends "
             "(over-long programs crash TPU workers; estimated host-side; "
             "over-budget configs run CHUNKED in bounded programs, and only "
             "configs whose prologue or single iteration alone exceeds the "
             "budget are refused; 0 disables the guard)",
    )
    p.add_argument(
        "--dispatch", choices=["auto", "monolithic", "chunked"],
        default="auto",
        help="program shape: one XLA program for the whole registration "
             "(monolithic), K-iteration programs re-dispatched from the "
             "host (chunked — identical math, bounded device time per "
             "program), or pick by the budget estimate (auto)",
    )
    p.add_argument(
        "--chunk-iterations", type=int, default=0,
        help="iterations per chunked-dispatch program (0 = derive from "
             "--program-budget)",
    )
    p.add_argument(
        "--warm-start", action="store_true",
        help="coarse-to-fine: register stride-subsampled clouds first and "
             "start the full-resolution run from the coarse result (fewer "
             "expensive iterations, same basin; big-correspondence runs "
             "benefit most; incompatible with finite-weight "
             "--observation-weights)",
    )
    p.add_argument(
        "--warm-start-points", type=int, default=1_000_000,
        help="target subsampled-cloud size of the coarse warm-start pass "
             "(clouds at/below this size skip the coarse pass)",
    )
    p.add_argument(
        "--warm-start-correspondences", type=int, default=1000,
        help="correspondence count of the coarse warm-start pass (capped "
             "at --correspondences)",
    )
    p.add_argument(
        "--stall-policy", choices=["warn", "wait"], default="warn",
        help="chunked-dispatch behavior when a chunk overruns its "
             "calibrated estimate (a degraded TPU worker window): warn "
             "logs and continues; wait holds the next chunk until a "
             "fresh-shape health probe answers ok (the device-resident "
             "carry makes waiting free), so a stalled window cannot "
             "silently multiply the run's wall time",
    )
    p.add_argument(
        "--probe-timeout", type=float, default=120.0,
        help="pre-flight accelerator health probe timeout in seconds for "
             "jobs routed to the accelerator (a degraded TPU worker hangs "
             "fresh compiles/transfers for many minutes while cached "
             "programs still run; the probe detects this and --device auto "
             "falls back to the CPU for CPU-tractable jobs instead of "
             "silently running ~100x slower; 0 disables the probe)",
    )
    p.add_argument("--quiet", action="store_true")
    return p


# Per-implementation semantics (SURVEY.md Q1/Q3/Q5/Q8):
# (solver, min_change, mad_scale, rejection_staging, std_ddof)
PRESETS = {
    "python": ("nonlinear", 1.0, 1.0, "python", 0),
    "cpp": ("linearized", 1.0, 1.4826, "joint", 1),
    "rust": ("linearized", 1.0, 1.4826, "joint", 1),
    "julia": ("linearized", 3.0, 1.4826, "joint", 1),
    "matlab": ("linearized", 3.0, 1.4826, "joint", 1),
}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    def _six(spec, flag):
        if spec is None:
            return (0.0,) * 6
        vals = tuple(float(v) for v in spec.split(","))
        if len(vals) != 6:
            raise SystemExit(
                f"{flag} needs six comma-separated values, got {len(vals)}"
            )
        return vals

    obs_vals = _six(args.observed_values, "--observed-values")
    obs_w = _six(args.observation_weights, "--observation-weights")

    from . import PointCloud, SimpleICP
    from .utils.xyz_io import write_xyz

    import logging as _logging
    import time as _time

    from .utils.log import enable_verbose_logging as _evl

    if not args.quiet:
        _evl()  # idempotent; set up before the parse so its timing line
        # (DEBUG, SIMPLEICP_TPU_DEBUG_TIMING=1) has a handler
    _log = _logging.getLogger("simpleicp_tpu.cli")
    _t0 = _time.time()
    pc_fix = PointCloud.from_xyz(args.fixed)
    pc_mov = PointCloud.from_xyz(args.movable)
    _log.debug("timing: parse both clouds %.2f s", _time.time() - _t0)

    max_overlap = math.inf if args.max_overlap_distance < 0 else args.max_overlap_distance

    # Route the job by size BEFORE any jax array work latches the backend
    # (PointCloud I/O is pure numpy): small registrations finish faster on
    # the local CPU than a tunnel-attached accelerator's process overhead.
    from .utils.device_policy import (
        apply_device,
        degraded_fallback,
        estimate_cpu_seconds,
        probe_default_backend,
        resolve_device,
    )

    resolved = resolve_device(
        args.device, len(pc_fix), len(pc_mov),
        correspondences=args.correspondences,
        max_overlap_distance=max_overlap,
        max_iterations=args.max_iterations,
        sharded=args.num_devices > 0,
    )
    if resolved != "cpu" and args.probe_timeout > 0:
        # Heading to the accelerator: health-probe it first (subprocess,
        # fresh shape, timeout) — a degraded worker would otherwise stall
        # this run for many minutes with no feedback.
        status, backend, _ = probe_default_backend(args.probe_timeout)
        if status != "ok" and backend != "cpu":
            resolved, msg = degraded_fallback(
                args.device, status,
                estimate_cpu_seconds(
                    len(pc_fix), len(pc_mov),
                    correspondences=args.correspondences,
                    max_overlap_distance=max_overlap,
                    max_iterations=args.max_iterations,
                ),
            )
            if msg and not args.quiet:
                print(f"WARNING: {msg}", file=sys.stderr, flush=True)
    apply_device(resolved)

    solver, min_change = args.solver, args.min_change
    mad_scale, staging, ddof = args.mad_scale, args.rejection_staging, args.std_ddof
    if args.preset is not None:
        solver, min_change, p_mad, p_staging, p_ddof = PRESETS[args.preset]
        mad_scale = p_mad if mad_scale is None else mad_scale
        staging = p_staging if staging is None else staging
        ddof = p_ddof if ddof is None else ddof

    icp = SimpleICP(verbose=not args.quiet)
    icp.add_point_clouds(pc_fix, pc_mov)
    _, X_out, _, _ = icp.run(
        correspondences=args.correspondences,
        neighbors=args.neighbors,
        min_planarity=args.min_planarity,
        max_overlap_distance=max_overlap,
        min_change=min_change,
        max_iterations=args.max_iterations,
        rbp_observed_values=obs_vals,
        rbp_observation_weights=obs_w,
        solver=solver,
        mad_scale=1.4826 if mad_scale is None else mad_scale,
        rejection_staging="python" if staging is None else staging,
        std_ddof=0 if ddof is None else ddof,
        debug_dirpath=args.debug_dirpath,
        approx_knn=args.approx_knn,
        gate_method=args.gate_method,
        match_method=args.match_method,
        match_radius=args.match_radius,
        program_budget_s=args.program_budget,
        dispatch=args.dispatch,
        chunk_iterations=args.chunk_iterations,
        warm_start=args.warm_start,
        warm_start_points=args.warm_start_points,
        warm_start_correspondences=args.warm_start_correspondences,
        stall_policy=args.stall_policy,
        num_devices=args.num_devices,
    )
    if args.export:
        _t0 = _time.time()
        write_xyz(args.export, X_out)
        _log.debug(
            "timing: write transformed cloud %.2f s", _time.time() - _t0
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
