#!/usr/bin/env python
"""Minimal repro: single-bit occupancy, 3-entry (dx, dy) table, wz 20 vs
24. Prints where the output bits actually land, revealing which shifts the
TPU kernel really applied."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from simpleicp_tpu.ops import dilate_gate as dg
from simpleicp_tpu.ops import dilate_pallas as dp

dp._UNROLL_MAX = 0

offs = ((3, 5, 0), (-2, 7, 0), (1, -4, 0))

for WZ in (20, 24):
    dp._build_call.cache_clear()
    occ_np = np.zeros((WZ, 64, 300), np.uint32)
    occ_np[WZ // 2, 31, 150] = 1 << 7
    occ = jnp.asarray(occ_np)
    want = np.asarray(dg._dilate_packed_multi(occ, [offs])[0])
    got = np.asarray(dp.dilate_packed_multi_pallas(occ, [offs])[0])
    wz_, wx, wy = np.nonzero(want)
    gz, gx, gy = np.nonzero(got)
    print(f"wz={WZ} want bits at x,y:",
          sorted(zip(wx - 31, wy - 150)), flush=True)
    print(f"wz={WZ} got  bits at x,y:",
          sorted(zip(gx - 31, gy - 150)), flush=True)
