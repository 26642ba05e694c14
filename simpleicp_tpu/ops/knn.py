"""Nearest-neighbor search as tiled dense distance kernels.

The reference implementations all use KD-trees (scipy cKDTree
/root/reference/python/simpleicp/pointcloud.py:161, nanoflann
/root/reference/c++/src/simpleicp.cpp:130-158, kiddo
/root/reference/rust/src/icp.rs:50-54). Trees are a poor fit for the TPU's
execution model (pointer chasing, data-dependent control flow), so this module
instead computes squared distances block-wise, keeping a running min / top-k
in registers while `lax.scan` streams reference tiles from HBM. Queries are
chunked with `lax.map` so peak memory is (query_tile x ref_tile) regardless
of cloud size.

Distance computation is the exact per-coordinate form

    d2 = (qx-rx)^2 + (qy-ry)^2 + (qz-rz)^2

on the VPU, NOT the |q|^2+|r|^2-2 q.r matmul identity. Two reasons, both
TPU-specific: (1) a K=3 contraction occupies 3/128 of the MXU's systolic
array, so the matmul form is no faster than the VPU form at any size;
(2) the identity cancels catastrophically when |coords| >> point spacing —
on TPU the default f32 matmul runs in bfloat16 passes, which corrupts the
argmin badly enough to stall ICP convergence entirely (measured: dragon
linearized solver 7 iterations exact vs >100 with the identity). Exact
diffs have no cancellation and need no centering or re-check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_BIG = jnp.inf


def _pad_rows(X: jnp.ndarray, multiple: int, fill) -> jnp.ndarray:
    n = X.shape[0]
    n_pad = (-n) % multiple
    if n_pad == 0:
        return X
    pad = jnp.full((n_pad,) + X.shape[1:], fill, dtype=X.dtype)
    return jnp.concatenate([X, pad], axis=0)


def _dist2_block(Q: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """(q, t) exact squared distances between query block Q (q,3) and ref
    tile R (t,3) — three broadcast subtract/square/accumulate VPU passes."""
    d2 = (Q[:, 0:1] - R[None, :, 0]) ** 2
    d2 += (Q[:, 1:2] - R[None, :, 1]) ** 2
    d2 += (Q[:, 2:3] - R[None, :, 2]) ** 2
    return d2


@functools.partial(jax.jit, static_argnames=("ref_tile", "query_tile", "layout"))
def nn_search(queries: jnp.ndarray, refs: jnp.ndarray, *, ref_tile: int = 4096,
              query_tile: int = 2048, ref_mask: jnp.ndarray | None = None,
              layout: str = "auto"):
    """Single nearest neighbor of each query among refs.

    Args:
        queries: (q, 3) query points.
        refs: (r, 3) reference points.
        ref_mask: optional (r,) bool — invalid reference rows are never
            selected (used for padded shards in the distributed path).
        layout: distance-block orientation — "qt" (query-major), "tq"
            (ref-tile-major, reduce over the major axis), or "auto" (pick
            by query count; see below). Results are bit-identical.

    Returns:
        (dist2, idx): exact squared distance to, and index of, the nearest
        reference point, shapes (q,), (q,) int32. dist2 is +inf when no valid
        reference exists.
    """
    n_q, n_r = queries.shape[0], refs.shape[0]
    ref_tile = min(ref_tile, max(8, n_r))
    query_tile = min(query_tile, max(8, n_q))
    dtype = queries.dtype

    refs_p = _pad_rows(refs, ref_tile, 0.0)
    n_tiles = refs_p.shape[0] // ref_tile
    ref_tiles = refs_p.reshape(n_tiles, ref_tile, 3)
    valid_rows = jnp.arange(n_tiles * ref_tile, dtype=jnp.int32) < n_r
    if ref_mask is not None:
        valid_rows = valid_rows & _pad_rows(ref_mask, ref_tile, False)
    tile_valid = valid_rows.reshape(n_tiles, ref_tile)

    queries_p = _pad_rows(queries, query_tile, 0.0)
    n_chunks = queries_p.shape[0] // query_tile
    query_chunks = queries_p.reshape(n_chunks, query_tile, 3)

    # Distance-block layout: for small query counts (the in-loop match
    # shape, C ~ 1000) the TRANSPOSED (ref_tile, q) block — reducing over
    # the MAJOR axis — measured 27% faster than (q, ref_tile) on the TPU
    # (0.38 vs 0.52 ms/match at 1000 x 100k, scripts/bench_match_variants.py:
    # the minor axis stays the 128-lane dimension while the reduction walks
    # sublanes). Both layouts tie-break toward the lower reference index,
    # so results are bit-identical.
    transposed = n_q <= 2048 if layout == "auto" else layout == "tq"

    def chunk_fn(Q):
        if transposed:
            Qx = Q[:, 0][None, :]
            Qy = Q[:, 1][None, :]
            Qz = Q[:, 2][None, :]

        def body(carry, xs):
            best_d, best_i = carry
            R, valid, base = xs
            if transposed:
                d2 = (R[:, 0:1] - Qx) ** 2
                d2 += (R[:, 1:2] - Qy) ** 2
                d2 += (R[:, 2:3] - Qz) ** 2          # (t, q)
                d2 = jnp.where(valid[:, None], d2, _BIG)
                tile_min = jnp.min(d2, axis=0)
                tile_arg = jnp.argmin(d2, axis=0).astype(jnp.int32) + base
            else:
                d2 = _dist2_block(Q, R)              # (q, t)
                d2 = jnp.where(valid[None, :], d2, _BIG)
                tile_min = jnp.min(d2, axis=1)
                tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + base
            take = tile_min < best_d
            return (
                jnp.where(take, tile_min, best_d),
                jnp.where(take, tile_arg, best_i),
            ), None

        init = (
            jnp.full((query_tile,), _BIG, dtype=dtype),
            jnp.zeros((query_tile,), dtype=jnp.int32),
        )
        bases = (jnp.arange(n_tiles, dtype=jnp.int32) * ref_tile)
        (best_d, best_i), _ = lax.scan(body, init, (ref_tiles, tile_valid, bases))
        return best_d, best_i

    d2, idx = lax.map(chunk_fn, query_chunks)
    return d2.reshape(-1)[:n_q], idx.reshape(-1)[:n_q]


# One-pass kNN budget: when the full (queries x refs) distance matrix fits
# this many elements (2^27 f32 = 536 MB), a single fused
# distance->lax.top_k program replaces the tile scan. Measured on the TPU
# at the normals-stage shape (1000 x 100k): 1.7 ms vs 8.1 ms for the
# 65536-row tile scan (scripts/bench_knn_variants.py) — XLA fuses the
# distance compute into top_k's pass, while the scan materializes per-tile
# blocks and pays one sort-based merge per step. Results are bit-identical
# (both tie-break toward the lower reference index).
_ONEPASS_ELEMS = 1 << 27


@functools.partial(
    jax.jit, static_argnames=("k", "ref_tile", "query_tile", "approx")
)
def knn_search(queries: jnp.ndarray, refs: jnp.ndarray, k: int, *, ref_tile: int = 4096,
               query_tile: int = 2048, ref_mask: jnp.ndarray | None = None,
               approx: bool = False):
    """k nearest neighbors of each query among refs (sorted ascending).

    Args:
        ref_mask: optional (r,) bool — invalid reference rows are never
            selected (padded-shard support; their slots return dist2=+inf).
        approx: use `jax.lax.approx_min_k` per reference tile (the TPU's
            hardware-assisted partial reduction; default recall ~0.95 per
            tile) with an exact top-k merge across tiles. Distances of the
            returned neighbors are exact; only the candidate set is
            approximate. Off by default — the pipeline's parity tests
            assume exact kNN.

    Returns:
        (dist2, idx): shapes (q, k) — exact squared distances and int32
        indices into refs, nearest first.
    """
    n_q, n_r = queries.shape[0], refs.shape[0]
    if k > n_r:
        raise ValueError(f"k={k} exceeds number of reference points {n_r}")

    if not approx and n_q * n_r <= _ONEPASS_ELEMS:
        d2 = _dist2_block(queries, refs)
        if ref_mask is not None:
            d2 = jnp.where(ref_mask[None, :], d2, _BIG)
        neg_top, idx = lax.top_k(-d2, k)
        return -neg_top, idx.astype(jnp.int32)
    ref_tile = min(ref_tile, max(k, 8, n_r))
    query_tile = min(query_tile, max(8, n_q))
    dtype = queries.dtype

    refs_p = _pad_rows(refs, ref_tile, 0.0)
    n_tiles = refs_p.shape[0] // ref_tile
    ref_tiles = refs_p.reshape(n_tiles, ref_tile, 3)
    valid_rows = jnp.arange(n_tiles * ref_tile, dtype=jnp.int32) < n_r
    if ref_mask is not None:
        valid_rows = valid_rows & _pad_rows(ref_mask, ref_tile, False)
    tile_valid = valid_rows.reshape(n_tiles, ref_tile)

    queries_p = _pad_rows(queries, query_tile, 0.0)
    n_chunks = queries_p.shape[0] // query_tile
    query_chunks = queries_p.reshape(n_chunks, query_tile, 3)

    def chunk_fn(Q):
        def body(carry, xs):
            best_d, best_i = carry  # (qt, k) running top-k, ascending
            R, valid, base = xs
            d2 = jnp.where(valid[None, :], _dist2_block(Q, R), _BIG)
            tile_idx = base + jnp.arange(ref_tile, dtype=jnp.int32)
            if approx:
                # hardware-assisted per-tile partial top-k, then an exact
                # merge over the (k + k) surviving candidates
                t_d, t_pos = lax.approx_min_k(d2, k)
                t_i = tile_idx[t_pos]
                cand_d = jnp.concatenate([best_d, t_d], axis=1)
                cand_i = jnp.concatenate([best_i, t_i], axis=1)
            else:
                cand_d = jnp.concatenate([best_d, d2], axis=1)
                cand_i = jnp.concatenate(
                    [best_i, jnp.broadcast_to(tile_idx[None, :], d2.shape)],
                    axis=1,
                )
            # top_k over the negated distances = k smallest, sorted ascending.
            neg_top, pos = lax.top_k(-cand_d, k)
            new_d = -neg_top
            new_i = jnp.take_along_axis(cand_i, pos, axis=1)
            return (new_d, new_i), None

        init = (
            jnp.full((query_tile, k), _BIG, dtype=dtype),
            jnp.zeros((query_tile, k), dtype=jnp.int32),
        )
        bases = (jnp.arange(n_tiles, dtype=jnp.int32) * ref_tile)
        (best_d, best_i), _ = lax.scan(body, init, (ref_tiles, tile_valid, bases))
        return best_d, best_i

    d2, idx = lax.map(chunk_fn, query_chunks)
    return d2.reshape(-1, k)[:n_q], idx.reshape(-1, k)[:n_q]


def nn_search_auto(queries: jnp.ndarray, refs: jnp.ndarray, *,
                   ref_tile: int = 4096, query_tile: int = 2048,
                   ref_mask: jnp.ndarray | None = None,
                   use_pallas: bool = True):
    """1-NN with automatic kernel selection: the hand-scheduled Pallas kernel
    on the TPU f32 fast path, the lax kernel everywhere else (CPU parity
    runs, f64, interpret-unfriendly contexts). Both produce bit-identical
    results (tests/test_knn_pallas.py)."""
    if (
        use_pallas
        and jax.default_backend() == "tpu"
        and queries.dtype == jnp.float32
    ):
        from .knn_pallas import nn_search_pallas

        return nn_search_pallas(queries, refs, ref_mask=ref_mask)
    return nn_search(
        queries, refs, ref_tile=ref_tile, query_tile=query_tile,
        ref_mask=ref_mask,
    )


def min_dist_sq(queries: jnp.ndarray, refs: jnp.ndarray, **kw) -> jnp.ndarray:
    """Squared distance from each query to its nearest reference point.

    This is the overlap-gate primitive (reference: cKDTree.query with
    distance_upper_bound, /root/reference/python/simpleicp/pointcloud.py:161-171).
    """
    d2, _ = nn_search(queries, refs, **kw)
    return d2
