#!/usr/bin/env python
"""Structural variants of the in-loop 1-NN match kernel, measured on TPU.

Round-1 xplane profile: the per-iteration match (C=1000 selected fixed
points vs the full transformed movable cloud) costs ~1 ms inside the
while_loop, ~8x above a VPU roofline estimate. This sweeps kernel
restructurings at the dragon shape; the winner replaces ops/knn.nn_search's
scan structure (keeping bit-identical argmins).

Variants:
  base       : current nn_search (scan over (q,t) tiles, where-mask, min+argmin)
  infpad     : pad refs with +inf coords, drop the validity where() per tile
  transposed : distance blocks laid out (t, q) — reduce over the MAJOR axis
  onepass    : no scan — a single (q, n_r) distance matrix, XLA picks tiling
  fused8     : 8 chained matches (the while_loop shape) for loop-overhead
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

from simpleicp_tpu.ops.knn import nn_search, _pad_rows
from simpleicp_tpu.utils.xyz_io import read_xyz

REPS = 7


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


def nn_infpad(queries, refs, *, ref_tile, query_tile):
    """inf-padded refs: padded rows get d2=+inf naturally, no where()."""
    n_q, n_r = queries.shape[0], refs.shape[0]
    dtype = queries.dtype
    big = jnp.asarray(np.finfo(np.float32).max / 8, dtype)
    refs_p = _pad_rows(refs, ref_tile, 0.0)
    n_tiles = refs_p.shape[0] // ref_tile
    # overwrite padded rows with big coords
    row_valid = jnp.arange(n_tiles * ref_tile) < n_r
    refs_p = jnp.where(row_valid[:, None], refs_p, big)
    ref_tiles = refs_p.reshape(n_tiles, ref_tile, 3)
    queries_p = _pad_rows(queries, query_tile, 0.0)
    n_chunks = queries_p.shape[0] // query_tile
    query_chunks = queries_p.reshape(n_chunks, query_tile, 3)

    def chunk_fn(Q):
        def body(carry, xs):
            best_d, best_i = carry
            R, base = xs
            d2 = (Q[:, 0:1] - R[None, :, 0]) ** 2
            d2 += (Q[:, 1:2] - R[None, :, 1]) ** 2
            d2 += (Q[:, 2:3] - R[None, :, 2]) ** 2
            tile_min = jnp.min(d2, axis=1)
            tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + base
            take = tile_min < best_d
            return (
                jnp.where(take, tile_min, best_d),
                jnp.where(take, tile_arg, best_i),
            ), None

        init = (
            jnp.full((query_tile,), jnp.inf, dtype=dtype),
            jnp.zeros((query_tile,), dtype=jnp.int32),
        )
        bases = jnp.arange(n_tiles, dtype=jnp.int32) * ref_tile
        (best_d, best_i), _ = lax.scan(body, init, (ref_tiles, bases))
        return best_d, best_i

    d2, idx = lax.map(chunk_fn, query_chunks)
    return d2.reshape(-1)[:n_q], idx.reshape(-1)[:n_q]


def nn_transposed(queries, refs, *, ref_tile, query_tile):
    """(t, q) distance blocks: the tile reduce runs over the major axis."""
    n_q, n_r = queries.shape[0], refs.shape[0]
    dtype = queries.dtype
    big = jnp.asarray(np.finfo(np.float32).max / 8, dtype)
    refs_p = _pad_rows(refs, ref_tile, 0.0)
    n_tiles = refs_p.shape[0] // ref_tile
    row_valid = jnp.arange(n_tiles * ref_tile) < n_r
    refs_p = jnp.where(row_valid[:, None], refs_p, big)
    ref_tiles = refs_p.reshape(n_tiles, ref_tile, 3)
    queries_p = _pad_rows(queries, query_tile, 0.0)
    n_chunks = queries_p.shape[0] // query_tile
    query_chunks = queries_p.reshape(n_chunks, query_tile, 3)

    def chunk_fn(Q):
        Qx, Qy, Qz = Q[:, 0][None, :], Q[:, 1][None, :], Q[:, 2][None, :]

        def body(carry, xs):
            best_d, best_i = carry  # (q,), (q,)
            R, base = xs  # (t, 3)
            d2 = (R[:, 0:1] - Qx) ** 2
            d2 += (R[:, 1:2] - Qy) ** 2
            d2 += (R[:, 2:3] - Qz) ** 2  # (t, q)
            tile_min = jnp.min(d2, axis=0)
            tile_arg = jnp.argmin(d2, axis=0).astype(jnp.int32) + base
            take = tile_min < best_d
            return (
                jnp.where(take, tile_min, best_d),
                jnp.where(take, tile_arg, best_i),
            ), None

        init = (
            jnp.full((query_tile,), jnp.inf, dtype=dtype),
            jnp.zeros((query_tile,), dtype=jnp.int32),
        )
        bases = jnp.arange(n_tiles, dtype=jnp.int32) * ref_tile
        (best_d, best_i), _ = lax.scan(body, init, (ref_tiles, bases))
        return best_d, best_i

    d2, idx = lax.map(chunk_fn, query_chunks)
    return d2.reshape(-1)[:n_q], idx.reshape(-1)[:n_q]


def nn_onepass(queries, refs):
    """Single (q, n_r) distance matrix — let XLA tile/fuse the whole thing."""
    d2 = (queries[:, 0:1] - refs[None, :, 0]) ** 2
    d2 += (queries[:, 1:2] - refs[None, :, 1]) ** 2
    d2 += (queries[:, 2:3] - refs[None, :, 2]) ** 2
    return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1).astype(jnp.int32)


def main():
    Xf = jnp.asarray(read_xyz("/root/reference/data/dragon1.xyz"), jnp.float32)
    Xm = jnp.asarray(read_xyz("/root/reference/data/dragon2.xyz"), jnp.float32)
    n = Xf.shape[0]
    print(f"# dragon n={n}", flush=True)
    C = 1000
    sel = np.round(np.linspace(0, n - 1, C)).astype(np.int32)
    Q0 = np.asarray(Xf)[sel]
    Qs = [jnp.asarray(Q0 + 1e-6 * (i + 1)) for i in range(3)]

    timed("null", lambda q: q[:4, 0], Qs)

    base = jax.jit(lambda q: nn_search(q, Xm, ref_tile=16384, query_tile=1024)[1])
    timed("base rt=16384", base, Qs)

    for rt in (16384, 65536, 131072):
        f = jax.jit(
            lambda q, rt=rt: nn_infpad(q, Xm, ref_tile=rt, query_tile=1024)[1]
        )
        timed(f"infpad rt={rt}", f, Qs)
        g = jax.jit(
            lambda q, rt=rt: nn_transposed(q, Xm, ref_tile=rt, query_tile=1024)[1]
        )
        timed(f"transposed rt={rt}", g, Qs)

    one = jax.jit(lambda q: nn_onepass(q, Xm)[1])
    timed("onepass", one, Qs)

    # cross-check correctness on one input
    want = np.asarray(base(Qs[0]))
    for name, f in [
        ("infpad", jax.jit(lambda q: nn_infpad(q, Xm, ref_tile=16384, query_tile=1024)[1])),
        ("transposed", jax.jit(lambda q: nn_transposed(q, Xm, ref_tile=16384, query_tile=1024)[1])),
        ("onepass", one),
    ]:
        got = np.asarray(f(Qs[0]))
        print(json.dumps({"check": name, "match": bool((got == want).all())}),
              flush=True)

    # fused N-iteration probes of the two structures (N=64: ~64x the
    # per-match signal vs the +/-5 ms tunnel jitter)
    def eight(fn, n_it=64):
        def run(q):
            def body(i, qq):
                idx = fn(qq)
                return qq + 1e-9 * idx[:, None].astype(jnp.float32)
            return lax.fori_loop(0, n_it, body, q)
        return jax.jit(run)

    timed("64x base rt=16384", eight(lambda q: nn_search(q, Xm, ref_tile=16384, query_tile=1024)[1]), Qs)
    timed("64x base rt=65536", eight(lambda q: nn_search(q, Xm, ref_tile=65536, query_tile=1024)[1]), Qs)
    timed("64x transposed rt=65536", eight(lambda q: nn_transposed(q, Xm, ref_tile=65536, query_tile=1024)[1]), Qs)
    timed("64x onepass", eight(lambda q: nn_onepass(q, Xm)[1]), Qs)
    timed("64x infpad rt=65536", eight(lambda q: nn_infpad(q, Xm, ref_tile=65536, query_tile=1024)[1]), Qs)


if __name__ == "__main__":
    main()
