#!/usr/bin/env python
"""Stage-by-stage diagnostic of the dilate-gate classify at scale on TPU.

Prints the classify_queries internal breakdown (fetch Xm0 / host pack /
device classify) via the module's DEBUG logging, plus plan geometry, for
the 12.5M tiled-dragon case that dominates the 27.9 s gated registration.
"""

import logging
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simpleicp_tpu.ops.dilate_gate import (
    bbox_of, classify_queries, overlap_mask_dilate, plan_dilate_gate,
)
from simpleicp_tpu.utils.xyz_io import read_xyz

logging.basicConfig(level=logging.DEBUG, format="%(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

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

t("classify cold (compile+run)", lambda: classify_queries(Xf, Xm, H0, plan=plan))
for i in range(3):
    t(f"classify warm {i}", lambda: classify_queries(Xf, Xm, H0, plan=plan))

t("full gate warm", lambda: overlap_mask_dilate(Xf, Xm, H0, RADIUS, plan))

# --- device-classify ROLL_BATCH sweep (pack once, reuse occ) -------------
from simpleicp_tpu.ops import dilate_gate as dg

Xm0 = np.stack([np.asarray(c) for c in dg._transform_cols(Xm, H0)], axis=1)
occ_dev = jnp.asarray(dg.pack_occupancy(Xm0, plan, np.float32))
for rb in (8, 16, 32):
    dg._ROLL_BATCH = rb
    dg._classify_packed.clear_cache()
    t(f"device classify rb={rb} cold", lambda: dg._classify_packed(Xf, occ_dev, plan=plan))
    for i in range(2):
        t(f"device classify rb={rb} warm {i}", lambda: dg._classify_packed(Xf, occ_dev, plan=plan))
dg._ROLL_BATCH = 8
dg._classify_packed.clear_cache()

# --- band exact-sweep layout comparison ----------------------------------
from simpleicp_tpu.ops.knn import min_dist_sq

in_m, band_m = dg._classify_packed(Xf, occ_dev, plan=plan)
band_idx = np.nonzero(np.asarray(band_m))[0].astype(np.int32)
print(f"band queries: {band_idx.size}", flush=True)
Q = jnp.asarray(np.asarray(Xf)[dg._pow2_pad(band_idx)])
for lay in ("qt", "tq"):
    t(f"band sweep layout={lay} cold",
      lambda: min_dist_sq(Q, Xm, ref_tile=65536, layout=lay))
    for i in range(2):
        t(f"band sweep layout={lay} warm {i}",
          lambda: min_dist_sq(Q, Xm, ref_tile=65536, layout=lay))
