"""Configuration for the ICP pipeline.

Canonical defaults follow the reference contract shared by all five
implementations (/root/reference/python/simpleicp/simpleicp.py:75-86,
/root/reference/c++/src/simpleicp-cli.cpp:15-35, /root/reference/rust/src/icp.rs:13-38).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    """Static (trace-time) configuration of one ICP registration run.

    All fields are Python scalars so a config hashes cleanly as a jit static
    argument; per-run dynamic data (the clouds, observed parameter values)
    are passed as arrays.

    Attributes:
        correspondences: number of points selected in the fixed cloud as
            correspondence queries (reference default 1000).
        neighbors: k for the normal-estimation k-NN neighborhood (default 10).
        min_planarity: minimum planarity to keep a correspondence (default 0.3).
        max_overlap_distance: overlap gate radius; ``inf`` disables the gate
            (reference: negative/inf disables).
        min_change: convergence threshold in percent on the change of
            mean/std of the residual distances (default 1.0; note the Julia /
            MATLAB reference variants default to 3 — SURVEY.md Q3).
        max_iterations: maximum ICP iterations (default 100).
        distance_weights: weight multiplying the point-to-plane residuals.
            ``None`` means "automatic": 1/std(d)^2 estimated in iteration 0 and
            frozen afterwards (/root/reference/python/simpleicp/simpleicp.py:229-234).
        mad_scale: scale factor from MAD to a robust sigma. The reference
            implementations disagree (SURVEY.md Q1): Python uses raw MAD
            (scale 1.0), C++/Rust/Julia/MATLAB and the docs use 1.4826. We
            default to 1.4826 (majority + documented behavior); set 1.0 for
            bit-parity with the reference Python.
        solver: "nonlinear" re-solves the six absolute parameters with an
            exact-rotation Gauss-Newton inner loop every ICP iteration — the
            behavioral superset matching reference Python semantics
            (observations, frozen parameters, weights). "linearized" performs
            one small-angle increment solve per iteration like the
            C++/Rust/Julia/MATLAB family (SURVEY.md §2.8).
        gn_iterations: MAX inner Gauss-Newton steps for the "nonlinear"
            solver. The inner loop is self-certifying: it exits once the
            relative step falls below 64*eps (machine-precision
            stationarity), so warm iterations take 2-4 steps and this cap
            only bounds pathological geometry. The per-iteration relative
            step is surfaced as IcpResult.iter_gn_rel_steps.
        query_tile / ref_tile: tile sizes of the distance kernels.
        use_pallas: use the hand-scheduled Pallas NN kernel for the overlap
            gate on TPU. Off by default: measured, the lax kernel wins at
            every scale (XLA's pipelining + larger tiles; 1M x 1M gate
            4.6 s lax vs 6.4 s Pallas — VMEM limits cap the Pallas tiles).
            The kernels remain available and validated (ops/knn_pallas.py).
    """

    correspondences: int = 1000
    neighbors: int = 10
    min_planarity: float = 0.3
    max_overlap_distance: float = math.inf
    min_change: float = 1.0
    max_iterations: int = 100
    distance_weights: Optional[float] = 1.0
    mad_scale: float = 1.4826
    solver: str = "nonlinear"
    gn_iterations: int = 24
    # Outlier-rejection staging (SURVEY.md Q5): "python" filters planarity
    # first and computes median/MAD on the survivors (reference Python);
    # "joint" computes median/MAD on ALL matched distances and applies both
    # criteria jointly (C++/Rust/Julia/MATLAB family).
    rejection_staging: str = "python"
    # ddof of the residual std used for logging + convergence (SURVEY.md
    # Q8): 0 = population std (reference Python, numpy default); 1 = sample
    # std (the native family).
    std_ddof: int = 0
    query_tile: int = 2048
    # ref_tile=0 means "auto": icp_register scales the tile with the
    # movable-cloud size (4096..65536). An explicit value is always honored.
    ref_tile: int = 0
    use_pallas: bool = False
    # Normal-estimation kNN via the TPU's hardware-assisted approx_min_k
    # (exact distances, ~0.95-recall candidate set per tile). Off by
    # default: reference parity assumes exact kNN.
    approx_knn: bool = False
    # Record the per-iteration trajectory (parameters, matched indices,
    # masks, distances) needed to replay the reference's debug xyz dumps.
    # Off by default: the (max_iterations, correspondences) buffers ride the
    # while_loop carry. The class API turns it on when debug_dirpath is set.
    record_trajectory: bool = False
    # Overlap-gate engine: "brute" = tiled dense distance sweep (exact,
    # O(nf*nm), wins below ~1e12 pairs); "dilate" = dilated-occupancy gate
    # (ops/dilate_gate.py — gather-free existence test over a dense cell
    # grid with exact band resolution; the scale engine whenever the joint
    # bounding box fits the cell budget); "grid" = spatial-hash cell list
    # (ops/gridhash.py, exact, O(27*cell_cap) gathers per query — fallback
    # for extreme volumetric extents); "auto" picks by size and fit.
    gate_method: str = "auto"
    # Static max hash-slot occupancy for the grid gate; 0 = computed
    # host-side by icp_register via ops.gridhash.grid_cell_cap.
    grid_cell_cap: int = 0
    # In-loop NN matcher: "brute" = tiled dense sweep over the transformed
    # movable cloud (exact, O(C*nm) per iteration — the right choice at the
    # reference's C=1000); "grid" = radius-bounded cell-list match against
    # the STATIC movable cloud with back-transformed queries (rigid motion
    # preserves distances, so NN(q, H x) == NN(H^-1 q, x) — one grid build
    # serves every iteration; O(27*cap) gathers per query). Grid matches are
    # exact NNs; correspondences whose NN lies beyond `match_radius` are
    # dropped for that iteration (with the overlap gate active, gated points
    # start within the radius, so drops only occur if the alignment
    # temporarily diverges). Use "grid" when C is large (1e5+) against big
    # clouds, where the brute sweep's C*nm pair cost dominates.
    # Exactness caveat: with solver="nonlinear" (exact trig rotations) the
    # grid matcher agrees with "brute" bit-for-bit. With solver="linearized"
    # the accumulated H is only approximately orthogonal (I + skew
    # increments, like reference Rust/Julia/MATLAB), so back-frame distances
    # carry an O(|alpha|^2)-relative metric distortion — near-ties between
    # two candidates closer than that may resolve differently than the
    # forward-frame brute matcher (same convergence basin either way).
    # "auto" (default) = brute below ~2.7e11 matched pairs per iteration,
    # grid above it when a radius is available (match_radius or the overlap
    # gate). Every reference config resolves to brute; the switch exists
    # because a C=1e5 x 12.5M brute match (1.25e12 pairs/iteration for 9+
    # iterations inside ONE program) trips the TPU runtime watchdog and
    # crashes the worker (measured 2026-08-19, BENCHMARKS.md kernel notes).
    match_method: str = "auto"
    # Cell size / exactness radius of the grid matcher; 0.0 = use
    # max_overlap_distance (requires the overlap gate to be enabled).
    match_radius: float = 0.0
    # Static max hash-slot occupancy for the grid matcher; 0 = computed
    # host-side by icp_register via ops.gridhash.grid_cell_cap.
    match_cell_cap: int = 0
    # Single-program device-time budget (seconds) on accelerator backends.
    # The whole registration compiles into ONE XLA program; runtimes with a
    # watchdog kill over-long programs AND take the worker down with them
    # (measured 2026-08-19: C=1e5 x 12.5M matches crashed the TPU worker
    # with both matcher engines). icp_register estimates the program's
    # device seconds host-side (utils/device_policy.py measured rates);
    # configs over budget run CHUNKED (dispatch="auto" below) in
    # bounded-size programs, and only configs whose prologue or single
    # iteration alone exceeds the budget are refused with guidance.
    # 0 disables the guard. CPU backends are never guarded.
    program_budget_s: float = 30.0
    # Program dispatch shape. "monolithic": prologue + all iterations in ONE
    # XLA program — the default winner when it fits the watchdog budget
    # (one launch, full fusion). "chunked": a prologue program plus
    # K-iteration while_loop programs re-dispatched from the host with the
    # carry staying on device — the same math bit-for-bit (the loop body is
    # shared; tests/test_chunked.py pins field-for-field equality), at the
    # cost of one dispatch + 3-scalar readback per chunk. "auto" picks
    # monolithic within budget, chunked beyond it; a monolithic-only refusal
    # then happens only when ONE iteration or the prologue alone would trip
    # the watchdog.
    dispatch: str = "auto"
    # Iterations per chunk program for chunked dispatch; 0 = derive from
    # program_budget_s (host-side, utils/device_policy.py rates), or 8 when
    # no budget applies.
    chunk_iterations: int = 0
    # Coarse-to-fine warm start (host-side planning, opt-in). When True,
    # icp_register first registers stride-subsampled clouds (~warm_start_points
    # points, warm_start_correspondences correspondences, exact brute match)
    # and feeds the coarse parameter vector in as the INITIAL rbp values
    # (the SURVEY.md Q10 initial-transform machinery, zero weights). The
    # expensive full-resolution run then starts near the basin and spends
    # its iterations on refinement only — at the C=1e5 x 12.5M exact
    # headline each saved iteration is ~5.6 s of device sweep time
    # (BENCHMARKS.md big-C notes). Same convergence basin, fewer
    # full-resolution iterations; the reported trajectory/iteration count
    # covers the full-resolution run. Incompatible with finite-weight rbp
    # observations (the warm start would replace their initial values;
    # weight=inf frozen parameters are preserved bit-for-bit).
    warm_start: bool = False
    # Target subsampled-cloud size and correspondence count of the coarse
    # warm-start registration. Tuning (measured on the C=1e5 x 12.5M
    # headline, BENCHMARKS.md): the 1M/1000 default converges in 3
    # full-resolution iterations (26.3 s vs 48.4 s cold, |dH| vs cold
    # 1.5e-3); 4M/2000 reaches the min_change 2-iteration floor (21.9 s)
    # at the cost of ~5e-3 transform drift from the cold optimum — the
    # criterion stops while refinement is still converging. Larger coarse
    # passes buy speed, not accuracy.
    warm_start_points: int = 1_000_000
    warm_start_correspondences: int = 1000
    # Scale of the absolute convergence noise floor (SURVEY.md §2.9 Q13):
    # a mean/std change of <= convergence_floor_scale * eps(dtype) * max|Q|
    # between iterations also counts as converged, in addition to the
    # reference's purely relative min_change criterion. In f32 the relative
    # criterion stalls on rounding jitter once the signal drops below
    # ~eps*|coords| (dragon f32: 41 iterations vs 7); in f64 the floor is
    # ~1e-14*|coords| and never fires, so reference semantics are exact on
    # the parity path. 0.0 disables the floor (pure reference criterion —
    # the Q13 parity tests pin that f64 results are bit-identical either
    # way).
    convergence_floor_scale: float = 32.0
    # Production policy when a chunked-dispatch chunk overruns its
    # calibrated estimate — the signature of a degraded worker window (the
    # round-4 #1 measured limiter: the SAME cached program intermittently
    # runs 2-13x its healthy time; a 48 s job measured at 1298 s).
    # "warn" (default): log the overrun and keep dispatching — correct, but
    # a long window silently multiplies wall time. "wait": additionally
    # HOLD the next chunk until a fresh-shape subprocess probe answers
    # healthy (utils/device_policy.probe_default_backend) — the carry stays
    # device-resident, so waiting costs nothing and loses nothing; the run
    # stops feeding chunks into the stalled window and resumes the moment
    # the worker heals. Cumulative stall-wait seconds are logged. The wait
    # gives up after ~30 min of failed probes and proceeds (a worker that
    # never heals should not deadlock the job). Only consulted by chunked
    # dispatch on accelerator backends.
    stall_policy: str = "warn"
    # Sharded overlap-gate collective strategy (parallel/sharded.py):
    # "ring" streams movable blocks/cell-lists around the mesh with ppermute
    # (constant per-device memory, comms interleaved with compute);
    # "allgather" materializes the full movable cloud (or all cell lists)
    # per device in one collective, then sweeps locally (fewer collective
    # launches, full-cloud memory per device). Bit-identical results —
    # parity-locked on the virtual mesh; which is faster depends on ICI
    # bandwidth vs latency, to be A/B'd on real multi-chip hardware
    # (scripts/bench_multichip.py sweeps both).
    gate_collective: str = "ring"

    def __post_init__(self):
        if self.correspondences < 6:
            raise ValueError("correspondences must be >= 6")
        if self.correspondences > 2**22:
            # round_linspace's bit-exactness proof covers n <= 2^22
            # (models/icp.py); beyond it the selection formula would be
            # silently unproven against the reference
            # (/root/reference/python/simpleicp/pointcloud.py:141-147).
            raise ValueError("correspondences must be <= 2**22 (4194304)")
        if self.neighbors < 3:
            raise ValueError("neighbors must be >= 3 to estimate a normal")
        if not 0.0 <= self.min_planarity < 1.0:
            raise ValueError("min_planarity must be in [0, 1)")
        if self.max_iterations < 1:
            raise ValueError("max_iterations must be >= 1")
        if self.distance_weights is not None and self.distance_weights <= 0:
            raise ValueError("distance_weights must be > 0")
        if self.solver not in ("nonlinear", "linearized"):
            raise ValueError("solver must be 'nonlinear' or 'linearized'")
        if self.rejection_staging not in ("python", "joint"):
            raise ValueError("rejection_staging must be 'python' or 'joint'")
        if self.std_ddof not in (0, 1):
            raise ValueError("std_ddof must be 0 or 1")
        if self.gate_method not in ("auto", "brute", "grid", "dilate"):
            raise ValueError(
                "gate_method must be 'auto', 'brute', 'grid' or 'dilate'"
            )
        if self.match_method not in ("auto", "brute", "grid"):
            raise ValueError("match_method must be 'auto', 'brute' or 'grid'")
        if self.match_radius < 0:
            raise ValueError("match_radius must be >= 0")
        if self.program_budget_s < 0:
            raise ValueError("program_budget_s must be >= 0 (0 disables)")
        if self.dispatch not in ("auto", "monolithic", "chunked"):
            raise ValueError(
                "dispatch must be 'auto', 'monolithic' or 'chunked'"
            )
        if self.chunk_iterations < 0:
            raise ValueError("chunk_iterations must be >= 0 (0 = auto)")
        if self.warm_start_points < 100:
            raise ValueError("warm_start_points must be >= 100")
        if self.warm_start_correspondences < 6:
            raise ValueError("warm_start_correspondences must be >= 6")
        if self.stall_policy not in ("warn", "wait"):
            raise ValueError("stall_policy must be 'warn' or 'wait'")
        if self.gate_collective not in ("ring", "allgather"):
            raise ValueError("gate_collective must be 'ring' or 'allgather'")
        if self.convergence_floor_scale < 0:
            raise ValueError(
                "convergence_floor_scale must be >= 0 (0 disables the floor)"
            )
        if self.match_method == "grid" and self.match_radius == 0.0 and not (
            math.isfinite(self.max_overlap_distance)
            and self.max_overlap_distance > 0
        ):
            raise ValueError(
                "match_method='grid' needs a radius: set match_radius or "
                "enable the overlap gate (max_overlap_distance)"
            )

    @property
    def overlap_enabled(self) -> bool:
        return math.isfinite(self.max_overlap_distance) and self.max_overlap_distance > 0


DEFAULT_RBP = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

RBP_NAMES: Tuple[str, ...] = ("alpha1", "alpha2", "alpha3", "tx", "ty", "tz")
