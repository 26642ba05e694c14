"""Logging bootstrap reproducing the reference's observability contract.

The reference's stdout output is a strict cross-language conformance surface
(SURVEY.md §5): stage banners, an iteration table, the 4x4 H matrix in
%12.6f, the per-parameter table, and `Finished in N.NNN seconds!` which the
benchmark harness parses (/root/reference/scripts/benchmark.sh:45-51).
Layered on stdlib logging with a NullHandler default and an idempotent
verbose handler (/root/reference/python/simpleicp/simpleicp.py:25-38).
"""

from __future__ import annotations

import logging

_PACKAGE = "simpleicp_tpu"


def get_logger(name: str = _PACKAGE) -> logging.Logger:
    return logging.getLogger(name)


def enable_verbose_logging() -> None:
    """Attach a message-only stdout handler at INFO level. Idempotent —
    repeated calls (e.g. several SimpleICP(verbose=True) instances) do not
    stack handlers. SIMPLEICP_TPU_DEBUG_TIMING=1 raises the level to DEBUG,
    surfacing the 'timing:' phase lines (parse/upload/register/fetch/write)
    used by scripts/bench_cli_scale.py to decompose end-to-end walls — the
    INFO contract lines (test_logging_contract) are unaffected."""
    import os

    pkg_log = logging.getLogger(_PACKAGE)
    pkg_log.setLevel(
        logging.DEBUG if os.environ.get("SIMPLEICP_TPU_DEBUG_TIMING")
        else logging.INFO
    )
    if any(getattr(h, "_simpleicp_tpu_verbose", False) for h in pkg_log.handlers):
        return
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter("%(message)s"))
    handler._simpleicp_tpu_verbose = True
    pkg_log.addHandler(handler)
