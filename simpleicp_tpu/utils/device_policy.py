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

# Measured sustained dense-sweep throughput of XLA:CPU on this class of
# host (min_dist_sq, f32, multithreaded): 7.6-9.2e8 pairs/s at gate-like
# shapes. Use the low end so borderline jobs keep the accelerator.
CPU_PAIRS_PER_SEC = 7.0e8
# Route to CPU when the estimated CPU time is below this. A healthy
# warm-cache TPU process still pays several seconds of remote setup and
# tunnel transfers, so sub-threshold jobs lose little in the worst case
# and typically win outright.
CPU_ROUTE_MAX_SEC = 20.0
# Typical iteration count of converging registrations (dragon/bunny 6-12;
# the reference caps at 100 but healthy runs never get there).
_TYPICAL_ITERATIONS = 10


def estimate_pair_work(
    nf: int,
    nm: int,
    *,
    correspondences: int = 1000,
    max_overlap_distance: float = math.inf,
    max_iterations: int = 100,
) -> float:
    """Total distance-pair count of one registration: overlap gate (when
    enabled) + normals kNN + the per-iteration NN match."""
    c = min(correspondences, nf)
    gate = float(nf) * nm if math.isfinite(max_overlap_distance) else 0.0
    knn = float(c) * nf
    loop = float(c) * nm * min(_TYPICAL_ITERATIONS, max_iterations)
    return gate + knn + loop


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
    work = estimate_pair_work(
        nf, nm,
        correspondences=correspondences,
        max_overlap_distance=max_overlap_distance,
        max_iterations=max_iterations,
    )
    return "cpu" if work / CPU_PAIRS_PER_SEC <= CPU_ROUTE_MAX_SEC else "default"


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
