#!/usr/bin/env python
"""Component isolation at wz=52: which kernel piece miscomputes?

  A: stencil {(0,0,z=5)} — exercises ONLY the z-shift prologue + one
     centered window (rotates by constant -PX/-PY).
  B: stencil = one z=0 ring of (dx,dy) offsets — no z-shifts, many
     dynamic rotates.
  C: threshold sweep wz in {21..27} with a small mixed stencil.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from simpleicp_tpu.ops import dilate_gate as dg
from simpleicp_tpu.ops import dilate_pallas as dp

rng = np.random.default_rng(5)
dp._UNROLL_MAX = 0  # force the looped-rotate path for every stencil size


def check(label, wz, nx, ny, offsets):
    dp._build_call.cache_clear()
    occ_np = np.where(
        rng.random((wz, nx, ny)) < 0.005,
        rng.integers(0, 2**32, (wz, nx, ny), dtype=np.uint32),
        np.uint32(0),
    )
    occ = jnp.asarray(occ_np)
    want = np.asarray(dg._dilate_packed_multi(occ, [offsets])[0])
    got_l = dp.dilate_packed_multi_pallas(occ, [offsets])
    if got_l is None:
        print(f"{label}: no plan", flush=True)
        return
    got = np.asarray(got_l[0])
    bad = want != got
    n_bad = int(bad.sum())
    extra = ""
    if n_bad:
        zz, xx, yy = np.nonzero(bad)
        extra = (f" z {zz.min()}-{zz.max()} x {xx.min()}-{xx.max()}"
                 f" y {yy.min()}-{yy.max()}")
    print(f"{label}: mismatch {n_bad}{extra}", flush=True)


ring = tuple((dx, dy, 0) for dx in range(-9, 10) for dy in range(-9, 10)
             if 64 <= dx * dx + dy * dy + 64 <= 81 + 64) + ((0, 0, 0),)

check("A z-only wz=52", 52, 400, 300, ((0, 0, 5),))
check("B rotates-only wz=52", 52, 401, 300, ring)
for wz in (21, 24, 25, 27):
    check(f"C mixed wz={wz}", wz, 402, 300,
          tuple((dx, dy, 2 - max(abs(dx), abs(dy)))
                for dx in range(-2, 3) for dy in range(-2, 3)) or None)
