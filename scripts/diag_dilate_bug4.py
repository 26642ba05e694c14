#!/usr/bin/env python
"""Arbitrate: numpy ground truth vs TPU-lax vs TPU-pallas dilation at a
failing geometry (wz=21, small mixed stencil)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from simpleicp_tpu.ops import dilate_gate as dg
from simpleicp_tpu.ops import dilate_pallas as dp

dp._UNROLL_MAX = 0

WZ, NX, NY = 21, 402, 300
offs = tuple(
    (dx, dy, 2 - max(abs(dx), abs(dy)))
    for dx in range(-2, 3) for dy in range(-2, 3)
)

rng = np.random.default_rng(5)
# consume the same rng stream positions as diag_dilate_bug3 is irrelevant;
# fresh draw is fine — we compare the three engines on the SAME input.
occ_np = np.where(
    rng.random((WZ, NX, NY)) < 0.005,
    rng.integers(0, 2**32, (WZ, NX, NY), dtype=np.uint32),
    np.uint32(0),
)


def numpy_dilate(occ, offsets):
    """Direct shift-OR reference in numpy (zero fill at borders)."""
    out = np.zeros_like(occ)
    for dx, dy, zr in offsets:
        # shift in x/y: target[a,b] gets source[a-dx? ...] — match the lax
        # semantics: dilation ORs occ shifted BY (dx,dy,dz): out[c] |=
        # occ[c - (dx,dy,dz)]... The lax version reads windows
        # oz_p[P-dx : P-dx+nx] which equals out[a] |= oz[a + P-dx - P] =
        # oz[a - dx]. So out[a,b] |= ozk[a - dx, b - dy].
        for dz in range(-zr, zr + 1):
            shifted = np.zeros_like(occ)
            # z bit-shift by dz with word carry: cell z index k -> k + dz
            # word w, bit b: out bit (32w+b) set iff occ bit (32w+b-dz).
            if dz >= 0:
                q, r = divmod(dz, 32)
            else:
                q, r = divmod(dz, 32)  # python floor div: q negative
            # bits: out_word[w] = (occ[w-q] << r) | (occ[w-q-1] >> (32-r))
            for w in range(occ.shape[0]):
                src1 = w - q
                acc = np.zeros(occ.shape[1:], np.uint32)
                if 0 <= src1 < occ.shape[0]:
                    acc |= (occ[src1] << np.uint32(r)) if r else occ[src1]
                src2 = w - q - 1
                if r and 0 <= src2 < occ.shape[0]:
                    acc |= occ[src2] >> np.uint32(32 - r)
                shifted[w] = acc
            # now shift x by dx, y by dy with zero fill
            tgt = np.zeros_like(occ)
            xs0, xs1 = max(dx, 0), occ.shape[1] + min(dx, 0)
            ys0, ys1 = max(dy, 0), occ.shape[2] + min(dy, 0)
            tgt[:, xs0:xs1, ys0:ys1] = shifted[
                :, xs0 - dx:xs1 - dx, ys0 - dy:ys1 - dy
            ]
            out |= tgt
    return out


want_np = numpy_dilate(occ_np, offs)
occ = jnp.asarray(occ_np)
lax_out = np.asarray(dg._dilate_packed_multi(occ, [offs])[0])
pl_out = np.asarray(dp.dilate_packed_multi_pallas(occ, [offs])[0])

print("numpy vs lax  :", int((want_np != lax_out).sum()), flush=True)
print("numpy vs palls:", int((want_np != pl_out).sum()), flush=True)
print("lax  vs palls :", int((lax_out != pl_out).sum()), flush=True)
