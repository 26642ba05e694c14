#!/usr/bin/env python
"""Gate-only timing across dilate-gate lattice resolutions (cell_div).

plan_dilate_gate auto-picks the FINEST cell_div fitting the memory/compute
budgets, minimizing the exact-resolution band. But the dilation passes are
HBM-bound with traffic ~ n_words x stencil columns ~ div^3 x div^2, while
the band sweep the fine lattice buys down only shrinks ~ div^-1 queries x
div^-1 refs — and the blocked slab join has made band resolution cheap.
This measures the full gate at each feasible cell_div to find the real
optimum per scale.

Usage: python scripts/diag_cell_div.py --n 12.5e6 --divs 16,8,4
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
    ap.add_argument("--divs", default="16,8,4")
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

    n = int(float(args.n))
    Xf = tile_cloud(X_fix0, n, extent * 1.05)
    Xm = tile_cloud(X_mov0, n, extent * 1.05)
    Xf_d = jax.block_until_ready(jnp.asarray(Xf, jnp.float32))
    Xm_d = jax.block_until_ready(jnp.asarray(Xm, jnp.float32))
    H0 = jnp.eye(4, dtype=jnp.float32)

    ref_mask = None
    for div_s in args.divs.split(","):
        div = int(div_s)
        plan = dg.plan_dilate_gate(Xf, Xm, args.radius, cell_div=div)
        if plan is None:
            print(json.dumps({"cell_div": div, "skipped": "over budget"}),
                  flush=True)
            continue
        for tag in ("warm", "timed"):
            t0 = time.perf_counter()
            mask = dg.overlap_mask_dilate(
                Xf_d, Xm_d, H0, args.radius, plan, Xm_host=Xm,
            )
            dt = time.perf_counter() - t0
            print(json.dumps({
                "cell_div": div, "pass": tag,
                "gate_seconds": round(dt, 3),
                "n_words_MB": round(plan.n_words * 4 / 1e6),
                "stencil_cols": len(plan.in_offsets) + len(plan.poss_offsets),
                "kept": int(mask.sum()),
            }), flush=True)
        if ref_mask is None:
            ref_mask = mask
        elif not np.array_equal(ref_mask, mask):
            print(f"MASK MISMATCH at cell_div={div}", flush=True)


if __name__ == "__main__":
    main()
