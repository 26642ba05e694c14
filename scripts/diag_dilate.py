"""Stage-by-stage diagnostic of the dilate gate at 12.5M on the TPU."""

import math
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simpleicp_tpu.ops.dilate_gate import (
    classify_queries, plan_dilate_gate, bbox_of, _fine_cells_i16,
    _min_d2_subset, _pow2_pad,
)
from simpleicp_tpu.utils.xyz_io import read_xyz

DATA = "/root/reference/data"
N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 12_500_000
RADIUS = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
CHUNK = int(float(sys.argv[3])) if len(sys.argv) > 3 else 0  # query chunk, 0 = one shot


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
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return out


X_fix0 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), jnp.float32)
X_mov0 = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), jnp.float32)
extent = float(jnp.max(X_fix0[:, 0]) - jnp.min(X_fix0[:, 0]))
Xf = t("tile fix", lambda: tile_cloud(X_fix0, N, extent * 1.05))
Xm = t("tile mov", lambda: tile_cloud(X_mov0, N, extent * 1.05))

H0 = jnp.eye(4, dtype=jnp.float32)
lo, hi = t("bbox", lambda: bbox_of(Xf, Xm, H0))
plan = plan_dilate_gate(None, None, RADIUS, bbox=(np.asarray(lo), np.asarray(hi)))
print("dims:", plan.dims, "cells:", plan.n_cells,
      "in_offsets:", len(plan.in_offsets),
      "poss_offsets:", len(plan.poss_offsets), flush=True)

in_mask, band_mask = t(
    "classify (compile+run)",
    lambda: classify_queries(Xf, Xm, H0, plan=plan),
)
in_np, band_np = t(
    "fetch masks", lambda: (np.asarray(in_mask), np.asarray(band_mask))
)
print("in:", in_np.sum(), "band:", band_np.sum(),
      "out:", (~in_np & ~band_np).sum(), flush=True)

cell0 = 1.0 / plan.inv_cell
divs = sorted(d for d in (8, 32) if (max(plan.dims) * cell0 * d / RADIUS) < 32000)
fine_div = divs[-1]
k64 = t(
    "fine cells",
    lambda: np.asarray(
        _fine_cells_i16(
            Xm, H0, jnp.asarray(plan.origin, jnp.float32),
            inv_cell=1.0 / (RADIUS / fine_div),
        )
    ),
).astype(np.int64)
t0 = time.perf_counter()
packed_fine = (k64[:, 0] << 32) | (k64[:, 1] << 16) | k64[:, 2]
order = np.argsort(packed_fine).astype(np.int32)
k_sorted = k64[order]
print(f"host sort: {time.perf_counter() - t0:.2f}s", flush=True)

band_idx = np.nonzero(band_np)[0].astype(np.int32)
remaining = band_idx
for div in divs:
    shift = int(np.log2(fine_div // div))
    kd = k_sorted >> shift
    packed = (kd[:, 0] << 32) | (kd[:, 1] << 16) | kd[:, 2]
    starts = np.empty(packed.size, bool)
    starts[0] = True
    np.not_equal(packed[1:], packed[:-1], out=starts[1:])
    rep_idx = _pow2_pad(order[starts])
    print(f"div={div}: reps={int(starts.sum())} padded={rep_idx.size} "
          f"queries={remaining.size}", flush=True)
    q_pad = _pow2_pad(remaining)
    if CHUNK and q_pad.size > CHUNK:
        d2_parts = []
        for s in range(0, q_pad.size, CHUNK):
            part = t(
                f"  sweep div={div} chunk {s // CHUNK} "
                f"({CHUNK} x {rep_idx.size})",
                lambda s=s: _min_d2_subset(
                    Xf, jnp.asarray(q_pad[s:s + CHUNK]), Xm, H0,
                    jnp.asarray(rep_idx),
                ),
            )
            d2_parts.append(np.asarray(part))
        d2 = np.concatenate(d2_parts)[: remaining.size]
    else:
        d2 = np.asarray(
            t(
                f"  sweep div={div} ({q_pad.size} x {rep_idx.size})",
                lambda: _min_d2_subset(
                    Xf, jnp.asarray(q_pad), Xm, H0, jnp.asarray(rep_idx)
                ),
            )
        )[: remaining.size]
    r2 = np.float32(RADIUS) * np.float32(RADIUS)
    diag = np.sqrt(3.0) * (RADIUS / div)
    extent_g = cell0 * max(plan.dims)
    slop = 8.0 * float(np.finfo(np.float32).eps) * extent_g * max(RADIUS, 1.0)
    proven_in = d2 <= r2
    proven_out = d2 > (RADIUS + diag + slop) ** 2
    remaining = remaining[~proven_in & ~proven_out]
    print(f"div={div}: left={remaining.size}", flush=True)
    if remaining.size == 0:
        break
print("done", flush=True)
