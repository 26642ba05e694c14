#!/usr/bin/env python
"""On-TPU equality check: Pallas dilation classify vs the lax path.

Runs _classify_packed twice at a mid scale (default 1M tiled dragon) with
the Pallas routing on and off, and asserts the IN/band masks are identical.
(CPU interpret-mode equality is locked by tests/test_dilate_pallas.py;
this checks the real Mosaic lowering.)
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from simpleicp_tpu.ops import dilate_gate as dg
from simpleicp_tpu.utils.xyz_io import read_xyz

DATA = "/root/reference/data"
N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
RADIUS = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0


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
Xf = tile_cloud(X_fix0, N, extent * 1.05)
Xm = tile_cloud(X_mov0, N, extent * 1.05)
H0 = jnp.eye(4, dtype=jnp.float32)
lo, hi = dg.bbox_of(Xf, Xm, H0)
plan = dg.plan_dilate_gate(None, None, RADIUS,
                           bbox=(np.asarray(lo), np.asarray(hi)))
print(f"dims {plan.dims} words {plan.n_words} "
      f"stencils {len(plan.in_offsets)}+{len(plan.poss_offsets)}", flush=True)

occ = dg._pack_occupancy_device(dg._transform(Xm, H0), plan=plan)

masks = {}
for use_pallas in (True, False):
    dg._USE_PALLAS_DILATE = use_pallas
    dg._classify_packed.clear_cache()
    t0 = time.perf_counter()
    in_m, band_m = jax.block_until_ready(
        dg._classify_packed(Xf, occ, plan=plan)
    )
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    in_m, band_m = jax.block_until_ready(
        dg._classify_packed(Xf, occ, plan=plan)
    )
    t_warm = time.perf_counter() - t0
    masks[use_pallas] = (np.asarray(in_m), np.asarray(band_m))
    print(f"pallas={use_pallas}: cold {t_cold:.2f}s warm {t_warm:.2f}s "
          f"in={masks[use_pallas][0].sum()} band={masks[use_pallas][1].sum()}",
          flush=True)

ok_in = bool((masks[True][0] == masks[False][0]).all())
ok_band = bool((masks[True][1] == masks[False][1]).all())
print(f"in masks equal: {ok_in}, band masks equal: {ok_band}", flush=True)
assert ok_in and ok_band
print("OK", flush=True)
