#!/usr/bin/env python
"""Record a hardware run where stall_policy='wait' ENGAGES (round-4
verdict item 2: the policy needs a recorded engagement, not just a CPU
unit test).

Default mode (--force) tightens the detection margins so a healthy chunk
counts as an overrun — the full production path (detect -> warn -> hold ->
subprocess probe loop -> resume from the device-resident carry -> cumulative
stall-seconds log) runs on real silicon; the artifact labels the engagement
`forced: true`. Without --force the margins are stock, so the policy only
engages if a REAL degraded window strikes during the run (record one
opportunistically when the worker is degraded).

Artifact: per-chunk walls, every stall-policy log line, result integrity
(H vs an untouched reference run of the same config).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(logging.INFO)
        self.records = []

    def emit(self, record):
        self.records.append(
            {"level": record.levelname, "msg": record.getMessage()})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=12.5e6)
    ap.add_argument("--c", type=int, default=100_000)
    ap.add_argument("--force", action="store_true",
                    help="tighten margins so a healthy chunk engages the "
                         "policy (mechanism demo on real hardware)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_bigc import tile_cloud
    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models import icp as icp_core
    from simpleicp_tpu.models.icp import icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    N, C = int(args.n), args.c
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X1 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), dtype)
    X2 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), dtype)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    X_fix = jax.block_until_ready(tile_cloud(X1, N, ext * 1.05))
    X_mov = jax.block_until_ready(tile_cloud(X2, N, ext * 1.05))

    # chunk_iterations=1: the warm-started full-res run takes ~3
    # iterations, and the FIRST chunk is excluded from detection (compile
    # conflation), so one-iteration chunks guarantee post-first chunks
    # exist for the policy to act on
    cfg_wait = IcpConfig(correspondences=C, warm_start=True,
                         stall_policy="wait", chunk_iterations=1)

    cap = _Capture()
    pkg = logging.getLogger("simpleicp_tpu")
    pkg.setLevel(logging.INFO)
    pkg.addHandler(cap)

    out = {"n_points": N, "correspondences": C,
           "backend": jax.default_backend(), "forced": bool(args.force),
           "stall_policy": "wait"}

    # compile pass (stock margins: first_chunk is excluded anyway)
    t0 = time.perf_counter()
    res0 = icp_register(X_fix, X_mov, cfg_wait)
    np.asarray(res0.H)
    out["compile_pass_seconds"] = round(time.perf_counter() - t0, 2)
    assert int(res0.error_code) == 0

    orig_margins = (icp_core._STALL_FACTOR, icp_core._STALL_SLACK_S,
                    icp_core._STALL_MIN_EST_S, icp_core._STALL_WAIT_SLEEP_S)
    if args.force:
        # a healthy chunk then reads as a >1x overrun: the policy engages
        # on real hardware with the REAL subprocess probe
        icp_core._STALL_FACTOR = 0.0
        icp_core._STALL_SLACK_S = 0.0
        icp_core._STALL_MIN_EST_S = 0.0
        icp_core._STALL_WAIT_SLEEP_S = 1.0
    cap.records.clear()
    Xm_i = jax.block_until_ready(X_mov + jnp.asarray(1e-7, dtype))
    t0 = time.perf_counter()
    res = icp_register(X_fix, Xm_i, cfg_wait)
    np.asarray(res.H)
    out["measured_seconds"] = round(time.perf_counter() - t0, 2)
    out["iterations"] = int(res.n_iterations)
    out["converged"] = bool(res.converged)
    out["error_code"] = int(res.error_code)
    out["log"] = cap.records
    out["engaged"] = any("stall_policy='wait'" in r["msg"]
                         for r in cap.records)

    # bit-neutrality on silicon: the same perturbed input under the stock
    # 'warn' policy (the SAVED shipped margins restored — re-hardcoding
    # them here would silently diverge if models/icp.py retunes them) must
    # produce the identical H — holding dispatch cannot touch the math
    (icp_core._STALL_FACTOR, icp_core._STALL_SLACK_S,
     icp_core._STALL_MIN_EST_S, icp_core._STALL_WAIT_SLEEP_S) = orig_margins
    res_warn = icp_register(
        X_fix, Xm_i,
        IcpConfig(correspondences=C, warm_start=True, stall_policy="warn",
                  chunk_iterations=1))
    out["bitequal_H_vs_warn_policy"] = bool(
        np.array_equal(np.asarray(res.H), np.asarray(res_warn.H)))

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
