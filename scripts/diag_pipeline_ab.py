#!/usr/bin/env python
"""A/B the speculative pipelined band-ref compaction against the
sequential dispatch, full dilate gate at a given size.

A: _BAND_FRAC_EST=0.02 (default) — compaction enqueued behind the classify
   before any mask bytes reach the host, all three masks fetched batched.
B: _BAND_FRAC_EST=0.0 — classify blocks, masks fetched, host nonzero,
   band indices decide, compaction dispatched sequentially (round-1 flow).

Usage: python scripts/diag_pipeline_ab.py [n_points]
"""

import logging
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from simpleicp_tpu.ops import dilate_gate as dg
from simpleicp_tpu.utils.xyz_io import read_xyz

logging.basicConfig(level=logging.DEBUG, format="%(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

DATA = "/root/reference/data"
N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 12_500_000
RADIUS = 1.0


def tile_cloud(X, n_target, spacing):
    n = X.shape[0]
    times = -(-n_target // n)
    k = math.ceil(times ** (1.0 / 3.0))
    ii = jnp.arange(k * k * k, dtype=X.dtype)[:times]
    off = jnp.stack([ii % k, (ii // k) % k, ii // (k * k)], axis=1) * spacing
    return (X[None, :, :] + off[:, None, :]).reshape(-1, 3)[:n_target]


X_fix0 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), jnp.float32)
X_mov0 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), jnp.float32)
extent = float(jnp.max(X_fix0[:, 0]) - jnp.min(X_fix0[:, 0]))
Xf = jax.block_until_ready(tile_cloud(X_fix0, N, extent * 1.05))
Xm = jax.block_until_ready(tile_cloud(X_mov0, N, extent * 1.05))
H0 = jnp.eye(4, dtype=jnp.float32)
lo, hi = dg.bbox_of(Xf, Xm, H0)
plan = dg.plan_dilate_gate(None, None, RADIUS,
                           bbox=(np.asarray(lo), np.asarray(hi)))

sums = {}
for label, frac in (("pipelined", 0.02), ("sequential", 0.0)):
    dg._BAND_FRAC_EST = frac
    for rep in range(2):
        t0 = time.perf_counter()
        mask = dg.overlap_mask_dilate(Xf, Xm, H0, RADIUS, plan)
        dt = time.perf_counter() - t0
        sums[label] = int(mask.sum())
        print(f"{label} rep={rep}: full gate {dt:.2f}s "
              f"selected={sums[label]}", flush=True)
assert len(set(sums.values())) == 1, f"A/B masks differ: {sums}"
print("masks identical across modes", flush=True)
