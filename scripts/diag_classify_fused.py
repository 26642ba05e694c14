#!/usr/bin/env python
"""Timing of the fused IN+POSS classify at the 12.5M tiled-dragon scale.

Compares against the pre-fusion baseline recorded in BENCHMARKS.md
(classify warm ~2.4 s at 12.5M): the fused _dilate_packed_multi shares the
incremental z-expansion and the per-level padded-grid stream between the
two stencils.
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simpleicp_tpu.ops.dilate_gate import (
    bbox_of, plan_dilate_gate,
)
from simpleicp_tpu.ops import dilate_gate as dg
from simpleicp_tpu.utils.xyz_io import read_xyz

DATA = "/root/reference/data"
N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 12_500_000
RADIUS = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0


def tile_cloud(X, n_target, spacing):
    n = X.shape[0]
    times = -(-n_target // n)
    k = math.ceil(times ** (1.0 / 3.0))
    ii = jnp.arange(k * k * k, dtype=X.dtype)[:times]
    off = jnp.stack([ii % k, (ii // k) % k, ii // (k * k)], axis=1) * spacing
    return (X[None, :, :] + off[:, None, :]).reshape(-1, 3)[:n_target]


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


X_fix0 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), jnp.float32)
X_mov0 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), jnp.float32)
extent = float(jnp.max(X_fix0[:, 0]) - jnp.min(X_fix0[:, 0]))
Xf = t("tile fix", lambda: tile_cloud(X_fix0, N, extent * 1.05))
Xm = t("tile mov", lambda: tile_cloud(X_mov0, N, extent * 1.05))

H0 = jnp.eye(4, dtype=jnp.float32)
lo, hi = t("bbox", lambda: bbox_of(Xf, Xm, H0))
plan = plan_dilate_gate(None, None, RADIUS, bbox=(np.asarray(lo), np.asarray(hi)))
print(
    f"dims: {plan.dims} n_words: {plan.n_words} "
    f"({plan.n_words * 4 / 1e6:.0f} MB packed) "
    f"in_offsets: {len(plan.in_offsets)} poss_offsets: {len(plan.poss_offsets)}",
    flush=True,
)

occ_dev = t("device pack", lambda: dg._pack_occupancy_device(
    dg._transform(Xm, H0), plan=plan))
t("classify cold (compile+run)",
  lambda: dg._classify_packed(Xf, occ_dev, plan=plan))
for i in range(3):
    t(f"classify warm {i}", lambda: dg._classify_packed(Xf, occ_dev, plan=plan))
