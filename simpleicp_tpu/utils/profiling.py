"""Profiling and per-stage timing hooks.

The reference's only observability is the wall-clock `Finished in N.NNN
seconds!` line (/root/reference/python/simpleicp/simpleicp.py:139,322 and
equivalents). The TPU build adds two layers on top of that contract:

  * `trace(logdir)` — a context manager around `jax.profiler` emitting an
    XPlane trace viewable in TensorBoard / Perfetto, for kernel-level
    analysis of the compiled registration program;
  * `StageTimer` — coarse host-side wall timers around pipeline stages
    (data load, device put, registration, readback), reported through the
    library logger. Device-internal stages (gate/normals/matching/solve)
    fuse into one XLA program by design, so per-stage device attribution
    comes from the profiler trace, not host timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

from .log import get_logger

_log = get_logger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of everything inside the context."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _log.info(f"jax profiler trace written to {logdir}")


class StageTimer:
    """Accumulates named wall-clock stage timings.

    Usage:
        timer = StageTimer()
        with timer.stage("load"):
            ...
        timer.report()
    """

    def __init__(self) -> None:
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = (
                self.timings.get(name, 0.0) + time.perf_counter() - t0
            )

    def report(self, logger: Optional[object] = None) -> Dict[str, float]:
        log = logger or _log
        total = sum(self.timings.values())
        for name, t in self.timings.items():
            log.info(f"stage {name:>14s}: {t:8.3f} s ({100 * t / max(total, 1e-12):5.1f}%)")
        log.info(f"stage {'total':>14s}: {total:8.3f} s")
        return dict(self.timings)
