#!/usr/bin/env python
"""Structural variants of the normals-stage exact kNN, measured on TPU.

The dragon device-time breakdown puts the normals kNN (C=1000 queries,
k=10, full 100k fixed cloud) at ~5.8 ms of ~15 ms total. The current kernel
merges per-tile candidates with lax.top_k over a (q, best+tile) concat —
top_k is sort-based and dominates. Variants measured here with 8x
amplification inside one jit (the ~32 ms tunnel roundtrip and its jitter
swamp single-shot readings).

Variants:
  topk     : current knn_search (concat + lax.top_k per tile)
  ksweep   : k sequential (min, argmin, mask-out) extractions per tile —
             pure elementwise/reduce ops, no sort
  onetopk  : one full (q, n_r) distance matrix + a single lax.top_k
  sortinto : per tile, sort only the 2k merged candidates after an
             approx_min_k-style exact per-tile reduction via k extractions
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from simpleicp_tpu.ops.knn import knn_search, _pad_rows
from simpleicp_tpu.utils.xyz_io import read_xyz

REPS = 7
K = 10


def timed(label, fn, variants):
    fn(variants[0])
    ts = []
    for i in range(REPS):
        v = variants[i % len(variants)]
        t0 = time.perf_counter()
        np.asarray(fn(v))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"op": label, "ms": round(float(np.median(ts)) * 1e3, 3)}),
          flush=True)


def _d2_block(Q, R):
    d2 = (Q[:, 0:1] - R[None, :, 0]) ** 2
    d2 += (Q[:, 1:2] - R[None, :, 1]) ** 2
    d2 += (Q[:, 2:3] - R[None, :, 2]) ** 2
    return d2


def knn_ksweep(queries, refs, k, *, ref_tile):
    """Per tile: extract the tile's top-k by k sequential min/argmin passes
    (masking each found column), then merge 2k candidates with one tiny
    top_k. All heavy ops are elementwise/reduce at full VPU rate."""
    n_q, n_r = queries.shape[0], refs.shape[0]
    dtype = queries.dtype
    big = jnp.asarray(np.finfo(np.float32).max / 8, dtype)
    refs_p = _pad_rows(refs, ref_tile, 0.0)
    n_tiles = refs_p.shape[0] // ref_tile
    row_valid = jnp.arange(n_tiles * ref_tile) < n_r
    refs_p = jnp.where(row_valid[:, None], refs_p, big)
    ref_tiles = refs_p.reshape(n_tiles, ref_tile, 3)
    iota = jnp.arange(ref_tile, dtype=jnp.int32)

    def body(carry, xs):
        best_d, best_i = carry  # (q, k) ascending
        R, base = xs
        d2 = _d2_block(queries, R)  # (q, t)
        td, ti = [], []
        for _ in range(k):
            m = jnp.min(d2, axis=1)
            a = jnp.argmin(d2, axis=1).astype(jnp.int32)
            td.append(m)
            ti.append(a + base)
            d2 = jnp.where(iota[None, :] == a[:, None], jnp.inf, d2)
        cand_d = jnp.concatenate([best_d, jnp.stack(td, axis=1)], axis=1)
        cand_i = jnp.concatenate([best_i, jnp.stack(ti, axis=1)], axis=1)
        neg_top, pos = lax.top_k(-cand_d, k)
        return (-neg_top, jnp.take_along_axis(cand_i, pos, axis=1)), None

    init = (
        jnp.full((queries.shape[0], k), jnp.inf, dtype=dtype),
        jnp.zeros((queries.shape[0], k), dtype=jnp.int32),
    )
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * ref_tile
    (best_d, best_i), _ = lax.scan(body, init, (ref_tiles, bases))
    return best_d, best_i


def knn_onetopk(queries, refs, k):
    d2 = _d2_block(queries, refs)
    neg, idx = lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)


def main():
    Xf = jnp.asarray(read_xyz("/root/reference/data/dragon1.xyz"), jnp.float32)
    n = Xf.shape[0]
    print(f"# dragon n={n}", flush=True)
    C = 1000
    sel = np.round(np.linspace(0, n - 1, C)).astype(np.int32)
    Q0 = np.asarray(Xf)[sel]
    Qs = [jnp.asarray(Q0 + 1e-6 * (i + 1)) for i in range(3)]

    timed("null", lambda q: q[:4, 0], Qs)

    def eight(fn):
        def run(q):
            def body(i, qq):
                _, idx = fn(qq)
                return qq + 1e-9 * idx[:, 0:1].astype(jnp.float32)
            return lax.fori_loop(0, 8, body, q)
        return jax.jit(run)

    v_topk16 = lambda q: knn_search(q, Xf, K, ref_tile=16384)
    v_topk64 = lambda q: knn_search(q, Xf, K, ref_tile=65536)
    v_ks16 = lambda q: knn_ksweep(q, Xf, K, ref_tile=16384)
    v_ks64 = lambda q: knn_ksweep(q, Xf, K, ref_tile=65536)
    v_one = lambda q: knn_onetopk(q, Xf, K)

    timed("8x topk rt=16384", eight(v_topk16), Qs)
    timed("8x topk rt=65536", eight(v_topk64), Qs)
    timed("8x ksweep rt=16384", eight(v_ks16), Qs)
    timed("8x ksweep rt=65536", eight(v_ks64), Qs)
    timed("8x onetopk", eight(v_one), Qs)

    want_d, want_i = jax.jit(v_topk16)(Qs[0])
    want_d, want_i = np.asarray(want_d), np.asarray(want_i)
    for name, f in [("ksweep", v_ks64), ("onetopk", v_one)]:
        got_d, got_i = jax.jit(f)(Qs[0])
        print(json.dumps({
            "check": name,
            "d_match": bool(np.allclose(np.asarray(got_d), want_d)),
            "i_match": bool((np.asarray(got_i) == want_i).all()),
        }), flush=True)


if __name__ == "__main__":
    main()
