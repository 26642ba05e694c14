#!/usr/bin/env python
"""Measure the blocked 2-D slab join's sensitivity to the x-slab size S0.

The production planner picks S0 from a statistical 2-D cost model
(dilate_gate._pick_slab_chunk_2d); its constants (VPU pair throughput,
dispatch latency, host sort rate) are estimates until calibrated on
hardware. This sweeps fixed S0 values (plus the model's own choice) over the
GATE ONLY (overlap_mask_dilate, no ICP loop) on tiled-dragon clouds and
reports wall time + the join's padded-pair/call diagnostics.

Usage:
  python scripts/diag_slab_s0.py --n 12.5e6 --force   # force join at 12.5M
  python scripts/diag_slab_s0.py --n 50e6             # the real 50M case
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_gated_scale import tile_cloud  # noqa: E402

DATA = "/root/reference/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", default="12.5e6")
    ap.add_argument("--radius", type=float, default=1.0)
    ap.add_argument("--s0", default="auto,8192,32768,131072,524288")
    ap.add_argument("--force", action="store_true",
                    help="force compaction+slab join regardless of size")
    args = ap.parse_args()

    logging.basicConfig(level=logging.DEBUG, format="%(message)s")
    logging.getLogger("jax").setLevel(logging.WARNING)

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu.ops import dilate_gate as dg
    from simpleicp_tpu.utils.xyz_io import read_xyz

    X_fix0 = read_xyz(f"{DATA}/dragon1.xyz")
    X_mov0 = read_xyz(f"{DATA}/dragon2.xyz")
    extent = float(np.max(X_fix0[:, 0]) - np.min(X_fix0[:, 0]))
    spacing = extent * 1.05

    n = int(float(args.n))
    Xf = tile_cloud(X_fix0, n, spacing)
    Xm = tile_cloud(X_mov0, n, spacing)
    Xf_d = jax.block_until_ready(jnp.asarray(Xf, jnp.float32))
    Xm_d = jax.block_until_ready(jnp.asarray(Xm, jnp.float32))
    H0 = jnp.eye(4, dtype=jnp.float32)

    if args.force:
        dg._DIRECT_SWEEP_MAX = 1 << 20
        dg._SLAB_SWEEP_MIN = 1 << 20

    plan = dg.plan_dilate_gate(Xf, Xm, args.radius, )
    assert plan is not None

    opts_default = dg._SLAB_CHUNK_OPTS
    ref_mask = None
    for s0_s in args.s0.split(","):
        dg._SLAB_CHUNK_OPTS = (
            opts_default if s0_s == "auto" else (int(float(s0_s)),)
        )
        # warm: compiles this S0's shapes; timed: the steady-state cost
        for tag in ("warm", "timed"):
            t0 = time.perf_counter()
            mask = dg.overlap_mask_dilate(
                Xf_d, Xm_d, H0, args.radius, plan, Xm_host=Xm,
            )
            dt = time.perf_counter() - t0
            print(json.dumps({
                "s0": s0_s, "pass": tag, "gate_seconds": round(dt, 3),
                "kept": int(mask.sum()),
            }), flush=True)
        if ref_mask is None:
            ref_mask = mask
        elif not np.array_equal(ref_mask, mask):
            print(f"MASK MISMATCH at s0={s0_s}", flush=True)
    dg._SLAB_CHUNK_OPTS = opts_default


if __name__ == "__main__":
    main()
