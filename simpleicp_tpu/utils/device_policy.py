"""Size-based device routing for the CLI / one-shot entry points.

The reference CLIs always run on the host CPU; this build's default
backend is a TPU reached through a tunnel, which is the right place for
large registrations but a poor one for small ones: a fresh process pays
the remote-compile helper (~1-2 min cold, seconds warm via the persistent
cache) plus ~30 ms dispatch latency per program, while the same dragon-
size job finishes end-to-end in ~2 s on the local XLA:CPU backend.

`resolve_device` picks per job: it estimates the total distance-pair work
of the pipeline from host-known sizes and routes the job to the CPU
backend whenever the CPU estimate is below a threshold that the TPU
process overhead alone would exceed. The estimate is deliberately coarse
(routing only needs the right order of magnitude); both backends compute
the identical program, so routing never changes results beyond the
documented f32/f64 dtype split (models/icp.py noise floor notes).
"""

from __future__ import annotations

import math

# Measured XLA:CPU throughputs on this class of host (f32, multithreaded).
# The IN-PROGRAM full-cloud gate (nn_search scan inside the jitted
# registration) sustains ~2.5e8 pairs/s (2e5 x 2e5 gated registration:
# 158 s for 4e10 gate pairs); the small-C in-loop match and normals kNN
# vectorize better, ~1e9 pairs/s (dragon: 7e8 loop pairs in ~0.5 s).
CPU_GATE_PAIRS_PER_SEC = 2.5e8
CPU_LOOP_PAIRS_PER_SEC = 1.0e9
# Route to CPU when the estimated CPU time is below this. A healthy
# warm-cache TPU process still pays several seconds of remote setup and
# tunnel transfers, so sub-threshold jobs lose little in the worst case
# and typically win outright.
CPU_ROUTE_MAX_SEC = 20.0
# Typical iteration count of converging registrations (dragon/bunny 6-12;
# the reference caps at 100 but healthy runs never get there).
_TYPICAL_ITERATIONS = 10


def estimate_cpu_seconds(
    nf: int,
    nm: int,
    *,
    correspondences: int = 1000,
    max_overlap_distance: float = math.inf,
    max_iterations: int = 100,
) -> float:
    """Estimated XLA:CPU seconds for one registration: overlap gate (when
    enabled) + normals kNN + the per-iteration NN match, each at its
    measured CPU rate."""
    c = min(correspondences, nf)
    gate = float(nf) * nm if math.isfinite(max_overlap_distance) else 0.0
    knn = float(c) * nf
    loop = float(c) * nm * min(_TYPICAL_ITERATIONS, max_iterations)
    return (gate / CPU_GATE_PAIRS_PER_SEC
            + (knn + loop) / CPU_LOOP_PAIRS_PER_SEC)


# Measured TPU v5e rates (round-3 calibration, scripts/calibrate_guard.py,
# calibration_tpu.json; previously BENCHMARKS.md kernel notes):
#   * dense 1-NN distance sweeps sustain ~2.24e11 pairs/s at scale on the
#     VPU (2.4e11 shipped round 2 — confirmed within 7%);
#   * k=10 kNN (the normals prologue) runs at only ~1.6e10 pairs/s — the
#     per-tile top-k maintenance costs ~14x over the plain min sweep.
#     Round 2 priced the prologue at the SWEEP rate, which under-estimated
#     a C=1e5 x 12.5M prologue 14x (~5 s est vs ~73 s real) and dispatched
#     a worker-killing program (2026-08-19 crash, round 3);
#   * random candidate gathers ~1.0-1.25e8 elements/s at scale (in-situ
#     grid_query_sorted confirms 1.03e8 effective).
TPU_SWEEP_PAIRS_PER_SEC = 2.2e11
TPU_KNN10_PAIRS_PER_SEC = 1.5e10  # measured 1.64-1.70e10 at scale; margin
TPU_GATHER_ELEMS_PER_SEC = 1.0e8
# Device sort throughput (the grid matcher's one-time cell-list build is a
# key+argsort over the movable cloud). Measured 5.2e7 elems/s standalone at
# 12.5M (profile_bigc.py, 2026-08-19 — the round-3 "13 s in-program" note
# was a degraded-window artifact); half that as margin. The build is a
# prologue one-off, never per-iteration.
TPU_SORT_ELEMS_PER_SEC = 2.5e7


def estimate_tpu_stage_seconds(
    nf: int,
    nm: int,
    *,
    correspondences: int = 1000,
    neighbors: int = 10,
    gate_pairs: float = 0.0,
    match_method: str = "brute",
    match_cell_cap: int = 0,
    has_normals: bool = False,
) -> tuple:
    """(gate_seconds, knn_seconds, build_seconds, per_iteration_seconds)
    of a registration on TPU.

    The prologue decomposes into the gate (when computed in-program), the
    normals kNN (absent when user normals are supplied), and the grid
    matcher's one-time cell-list build; one iteration is the NN match.
    Used by the watchdog guard / dispatch planner: the kNN piece is
    independently chunkable (query blocks), the gate and build are atomic
    programs, and K iterations go per chunk program.
    """
    c = min(correspondences, nf)
    gate_s = gate_pairs / TPU_SWEEP_PAIRS_PER_SEC
    # top-k cost grows roughly with k (merge depth); 1.5e10 is the k=10 rate
    knn_rate = TPU_KNN10_PAIRS_PER_SEC * (10.0 / max(neighbors, 1))
    knn_s = 0.0 if has_normals else float(c) * nf / knn_rate
    build_s = (float(nm) / TPU_SORT_ELEMS_PER_SEC
               if match_method == "grid" else 0.0)
    if match_method == "grid":
        # 27 neighbor cells x cap candidate slots x 3 gathered coords
        per_iter = (float(c) * 27.0 * max(match_cell_cap, 1) * 3.0
                    / TPU_GATHER_ELEMS_PER_SEC)
    else:
        per_iter = float(c) * nm / TPU_SWEEP_PAIRS_PER_SEC
    return gate_s, knn_s, build_s, per_iter


def estimate_tpu_program_seconds(
    nf: int,
    nm: int,
    *,
    correspondences: int = 1000,
    gate_pairs: float = 0.0,
    match_method: str = "brute",
    match_cell_cap: int = 0,
    iterations: int = _TYPICAL_ITERATIONS,
) -> float:
    """Rough device-seconds of ONE monolithic registration program on the
    TPU.

    The whole pipeline (gate + normals kNN + the iterated match) compiles
    into a single XLA program; runtimes with a watchdog kill programs that
    run too long (measured 2026-08-19: a C=1e5 x 12.5M match crashed the
    worker with BOTH matcher engines). Used by icp_register to route such
    configs to chunked dispatch host-side instead of crashing a shared
    worker.
    """
    gate_s, knn_s, build_s, per_iter = estimate_tpu_stage_seconds(
        nf, nm, correspondences=correspondences, gate_pairs=gate_pairs,
        match_method=match_method, match_cell_cap=match_cell_cap,
    )
    return gate_s + knn_s + build_s + iterations * per_iter


def resolve_device(
    choice: str,
    nf: int,
    nm: int,
    *,
    correspondences: int = 1000,
    max_overlap_distance: float = math.inf,
    max_iterations: int = 100,
    sharded: bool = False,
) -> str:
    """Resolve a --device request to "cpu" or "default".

    "default" means: leave the platform alone (the TPU backend when one is
    configured). "auto" routes small jobs to CPU per the cost model above;
    sharded runs always keep the default platform (the user asked for a
    device mesh).
    """
    if choice == "cpu":
        return "cpu"
    if choice == "tpu" or sharded:
        return "default"
    if choice != "auto":
        raise ValueError(f"unknown device choice: {choice!r}")
    sec = estimate_cpu_seconds(
        nf, nm,
        correspondences=correspondences,
        max_overlap_distance=max_overlap_distance,
        max_iterations=max_iterations,
    )
    return "cpu" if sec <= CPU_ROUTE_MAX_SEC else "default"


# A degraded accelerator worker (post-big-job stall, crash recovery) hangs
# fresh compiles/transfers for 5-60+ minutes while CACHED programs still run
# (CLAUDE.md; measured 2026-08-19: a warm 6.7 s gated 12.5M registration took
# 770 s inside such a window). When the pre-flight probe detects one, --device
# auto falls back to the local CPU whenever the job is estimated under this
# many CPU seconds — a bounded slowdown beats an unbounded stall.
DEGRADED_CPU_FALLBACK_MAX_S = 3600.0


def probe_default_backend(timeout_s: float = 120.0) -> tuple:
    """Pre-flight health probe of the default jax backend, in a SUBPROCESS
    under a timeout: fresh-shape matmul with a forced readback (fresh shapes
    defeat program caching, so a real compile+transfer is exercised — cached
    programs keep running on a degraded worker while new ones hang).

    Returns (status, backend, seconds): status "ok" | "timeout" | "error";
    backend is the subprocess's default backend name when known ("" on
    timeout). Must run BEFORE any in-process jax array work — a first touch
    of a stalled worker hangs uninterruptibly in-process (bench.py's
    _wait_for_device is the original pattern)."""
    import random
    import subprocess
    import sys
    import time

    n = 517 + random.randrange(256)
    code = (
        # JAX_PLATFORMS alone does not override a registered plugin backend;
        # apply it via config so CPU-forced environments probe CPU.
        "import os\n"
        "plat = os.environ.get('JAX_PLATFORMS')\n"
        "import jax\n"
        "if plat: jax.config.update('jax_platforms', plat)\n"
        "import numpy as np, jax.numpy as jnp\n"
        f"x = jnp.ones(({n}, 331), jnp.float32)\n"
        "np.asarray(x @ x.T)\n"
        "print('PROBE', jax.default_backend())\n"
    )
    t0 = time.monotonic()
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return "timeout", "", timeout_s
    dt = time.monotonic() - t0
    backend = ""
    for line in (r.stdout or "").splitlines():
        if line.startswith("PROBE "):
            backend = line.split()[1]
    return ("ok" if r.returncode == 0 else "error"), backend, dt


def degraded_fallback(choice: str, probe_status: str, cpu_est_s: float) -> tuple:
    """Routing decision after a failed health probe ("timeout"/"error").

    Returns (resolved, message): resolved "cpu" to reroute or "default" to
    proceed on the accelerator; message is a human-readable warning (always
    set when the probe failed). Policy: --device auto falls back to CPU for
    jobs bounded by DEGRADED_CPU_FALLBACK_MAX_S of estimated CPU time;
    forced tpu (or CPU-intractable jobs) proceed with a loud warning rather
    than refusing — cached programs may still run, and the worker usually
    heals in minutes."""
    if probe_status == "ok":
        return "default", None
    why = ("did not answer a fresh-shape probe (worker stalled or "
           "recovering)" if probe_status == "timeout"
           else "failed a fresh-shape probe (worker likely recovering "
                "from a crash)")
    if choice == "auto" and cpu_est_s <= DEGRADED_CPU_FALLBACK_MAX_S:
        return "cpu", (
            f"accelerator {why}; routing this registration to the local "
            f"CPU backend (estimated ~{cpu_est_s:.0f} s there). Use "
            "--device tpu to wait for the accelerator instead."
        )
    return "default", (
        f"accelerator {why}; proceeding anyway"
        + (" (--device tpu was forced)" if choice == "tpu" else
           f" (job too large for the CPU fallback: ~{cpu_est_s:.0f} s "
           "estimated there)")
        + " — expect long stalls until the worker heals (typically "
        "5-10 min after a crash, up to an hour after very large jobs)."
    )


def apply_device(resolved: str) -> None:
    """Apply a resolved routing decision to the process' jax config.

    Must run before the first jax array operation of the process (backend
    selection is latched at first use — `JAX_PLATFORMS=cpu` in the
    environment does NOT override an already-registered plugin backend,
    see tests/conftest.py / CLAUDE.md). A no-op for "default"."""
    if resolved != "cpu":
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - backend already latched
        import logging

        logging.getLogger(__name__).warning(
            "could not route to CPU (jax backend already initialized); "
            "continuing on the default platform"
        )


def probe_until_healthy(timeout_s: float = 120.0, budget_s: float = 1200.0,
                        sleep_s: float = 60.0) -> bool:
    """Probe-RETRY-until-healthy (the CLAUDE.md benchmarking rule: degraded
    windows strike mid-benchmark, so probe before every timed row). Retries
    `probe_default_backend` every `sleep_s` until it answers "ok" or
    `budget_s` elapses; returns whether the last probe was healthy. ONE
    implementation shared by the bench scripts — the retry policy used to
    live copy-pasted in each."""
    import time

    deadline = time.monotonic() + budget_s
    while True:
        st, _backend, psec = probe_default_backend(timeout_s)
        print(f"  probe: {st} in {psec:.1f} s", flush=True)
        if st == "ok" or time.monotonic() > deadline:
            return st == "ok"
        time.sleep(sleep_s)
