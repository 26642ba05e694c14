"""Pallas TPU kernel for 1-nearest-neighbor search.

The lax kernel in ops/knn.py expresses the tiled NN scan as
`lax.map(lax.scan(...))` and leaves scheduling to XLA; this module is the
hand-scheduled Pallas version of the same exact-squared-difference algorithm
(replacing the reference's KD-trees, e.g. scipy cKDTree at
/root/reference/python/simpleicp/pointcloud.py:161 and nanoflann at
/root/reference/c++/src/simpleicp.cpp:130-158):

  * grid = (query_tiles, ref_tiles) with the ref axis minor, so each query
    tile stays resident while reference tiles stream HBM -> VMEM through the
    pipelined BlockSpec machinery (double-buffered DMA for free);
  * the running (best distance, best index) lives in VMEM scratch, carried
    across the sequential ref-tile steps, and is flushed to the output block
    on the last step;
  * distances are exact per-coordinate squared differences on the VPU — a
    K=3 matmul cannot use the MXU efficiently (3/128 of the systolic array)
    and the |q|^2+|r|^2-2qr identity is catastrophically inaccurate in
    bf16/f32 (see ops/knn.py docstring), so the VPU form is both the fast
    and the correct choice;
  * invalid reference rows (tail padding, masked shards) are neutralized by
    adding a large constant to their distance column.

Intended for the f32 TPU fast path; f64 (CPU parity) and non-TPU backends
use the lax kernel. Outputs are bit-identical to ops/knn.nn_search for the
same inputs: same exact distances, same first-minimum tie-breaking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # large but finite: keeps masked lanes orderable, no inf-inf NaNs


def _nn_kernel(q_ref, rx_ref, ry_ref, rz_ref, mask_ref, out_d_ref, out_i_ref,
               best_d, best_i, *, ref_tile: int):
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        best_d[:] = jnp.full(best_d.shape, _BIG, best_d.dtype)
        best_i[:] = jnp.zeros(best_i.shape, best_i.dtype)

    Q = q_ref[:]  # (TQ, 3)
    # (TQ, TR) exact squared distances, coordinate planes as (1, TR) rows.
    d2 = (Q[:, 0:1] - rx_ref[:]) ** 2
    d2 += (Q[:, 1:2] - ry_ref[:]) ** 2
    d2 += (Q[:, 2:3] - rz_ref[:]) ** 2
    d2 += (1.0 - mask_ref[:]) * _BIG

    tile_min = jnp.min(d2, axis=1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + ri * ref_tile
    take = tile_min < best_d[:]
    best_d[:] = jnp.where(take, tile_min, best_d[:])
    best_i[:] = jnp.where(take, tile_arg, best_i[:])

    @pl.when(ri == pl.num_programs(1) - 1)
    def _():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = best_i[:]


def _knn_kernel(q_ref, rx_ref, ry_ref, rz_ref, mask_ref, out_d_ref, out_i_ref,
                best_d, best_i, *, ref_tile: int, k: int):
    """k-NN via per-tile extract-min insertion.

    Scratch holds the current k best (unsorted) per query row. For each
    reference tile, k rounds of: take the tile's row-minimum, insert it over
    the row's current worst if smaller, and mask it out of the tile. Any
    tile value beyond its k smallest can never belong in the top-k, so k
    insertion rounds per tile are sufficient. The output pass extracts the
    scratch ascending (k more min rounds)."""
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        best_d[:] = jnp.full(best_d.shape, _BIG, best_d.dtype)
        best_i[:] = jnp.zeros(best_i.shape, best_i.dtype)

    Q = q_ref[:]
    d2 = (Q[:, 0:1] - rx_ref[:]) ** 2
    d2 += (Q[:, 1:2] - ry_ref[:]) ** 2
    d2 += (Q[:, 2:3] - rz_ref[:]) ** 2
    d2 += (1.0 - mask_ref[:]) * _BIG

    tq = Q.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, ref_tile), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    bd = best_d[:]
    bi = best_i[:]
    for _ in range(k):
        tile_min = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        worst = jnp.max(bd, axis=1)
        worst_pos = jnp.argmax(bd, axis=1).astype(jnp.int32)
        take = tile_min < worst
        at_worst = col == worst_pos[:, None]
        repl = take[:, None] & at_worst
        bd = jnp.where(repl, tile_min[:, None], bd)
        bi = jnp.where(repl, (tile_arg + ri * ref_tile)[:, None], bi)
        d2 = jnp.where(lane == tile_arg[:, None], _BIG, d2)
    best_d[:] = bd
    best_i[:] = bi

    @pl.when(ri == pl.num_programs(1) - 1)
    def _():
        # ascending extraction of the k scratch entries
        bd = best_d[:]
        bi = best_i[:]
        for j in range(k):
            m = jnp.min(bd, axis=1)
            a = jnp.argmin(bd, axis=1).astype(jnp.int32)
            at_min = col == a[:, None]
            # one-hot select (Mosaic has no row-gather on VMEM values)
            sel = jnp.sum(jnp.where(at_min, bi, 0), axis=1)
            out_d_ref[:, j] = m
            out_i_ref[:, j] = sel
            bd = jnp.where(at_min, _BIG, bd)


@functools.partial(
    jax.jit, static_argnames=("k", "ref_tile", "query_tile", "interpret")
)
def knn_search_pallas(queries: jnp.ndarray, refs: jnp.ndarray, k: int, *,
                      ref_tile: int = 1024, query_tile: int = 512,
                      ref_mask: jnp.ndarray | None = None,
                      interpret: bool = False):
    """k nearest neighbors (sorted ascending) — Pallas TPU kernel.

    Same contract as ops/knn.knn_search: returns (dist2, idx) of shapes
    (q, k). Slots beyond the number of valid references return _BIG / 0.
    Exactly-equidistant neighbors may be ordered differently than the lax
    kernel's top_k (extract-min insertion order vs sort stability); the
    distances themselves are identical.

    Default tiles are VMEM-sized for the k-insertion temporaries: the kernel
    holds ~3 live (query_tile, ref_tile) f32 blocks, and the 16 MB scoped
    VMEM limit rejects 1024x4096 at k=10 (measured: 28.7 MB requested).
    """
    n_q, n_r = queries.shape[0], refs.shape[0]
    if k > n_r:
        raise ValueError(f"k={k} exceeds number of reference points {n_r}")
    dtype = queries.dtype

    q_pad = (-n_q) % query_tile
    r_pad = (-n_r) % ref_tile
    Q = jnp.pad(queries, ((0, q_pad), (0, 0)))
    R = jnp.pad(refs, ((0, r_pad), (0, 0)))
    valid = jnp.arange(n_r + r_pad, dtype=jnp.int32) < n_r
    if ref_mask is not None:
        valid = valid & jnp.pad(ref_mask, (0, r_pad))
    maskf = valid.astype(dtype)[None, :]
    rx = R[:, 0][None, :]
    ry = R[:, 1][None, :]
    rz = R[:, 2][None, :]

    n_q_tiles = (n_q + q_pad) // query_tile
    n_r_tiles = (n_r + r_pad) // ref_tile

    plane_spec = pl.BlockSpec(
        (1, ref_tile), lambda qi, ri: (0, ri), memory_space=pltpu.VMEM
    )
    d2, idx = pl.pallas_call(
        functools.partial(_knn_kernel, ref_tile=ref_tile, k=k),
        grid=(n_q_tiles, n_r_tiles),
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            plane_spec, plane_spec, plane_spec, plane_spec,
        ],
        out_specs=[
            pl.BlockSpec((query_tile, k), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q_tiles * query_tile, k), dtype),
            jax.ShapeDtypeStruct((n_q_tiles * query_tile, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, k), dtype),
            pltpu.VMEM((query_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(Q, rx, ry, rz, maskf)
    return d2[:n_q], idx[:n_q]


def _match_transform_kernel(h_ref, q_ref, rx_ref, ry_ref, rz_ref,
                            out_d_ref, out_i_ref, best_d, best_i,
                            *, ref_tile: int):
    """1-NN of each query among refs transformed in-VMEM by the rigid H
    whose (3, 4) [R | t] block sits in SMEM. The ICP while_loop's match
    step (reference rebuilds a KD-tree over the moved cloud every
    iteration, /root/reference/python/simpleicp/corrpts.py:131-132) calls
    this with the ORIGINAL movable planes: the transform costs ~12 VPU ops
    per reference lane, so the moved cloud is never materialized in HBM."""
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        best_d[:] = jnp.full(best_d.shape, _BIG, best_d.dtype)
        best_i[:] = jnp.zeros(best_i.shape, best_i.dtype)

    x, y, z = rx_ref[:], ry_ref[:], rz_ref[:]
    tx = h_ref[0, 0] * x + h_ref[0, 1] * y + h_ref[0, 2] * z + h_ref[0, 3]
    ty = h_ref[1, 0] * x + h_ref[1, 1] * y + h_ref[1, 2] * z + h_ref[1, 3]
    tz = h_ref[2, 0] * x + h_ref[2, 1] * y + h_ref[2, 2] * z + h_ref[2, 3]

    Q = q_ref[:]  # (TQ, 3)
    d2 = (Q[:, 0:1] - tx) ** 2
    d2 += (Q[:, 1:2] - ty) ** 2
    d2 += (Q[:, 2:3] - tz) ** 2

    tile_min = jnp.min(d2, axis=1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + ri * ref_tile
    take = tile_min < best_d[:]
    best_d[:] = jnp.where(take, tile_min, best_d[:])
    best_i[:] = jnp.where(take, tile_arg, best_i[:])

    @pl.when(ri == pl.num_programs(1) - 1)
    def _():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = best_i[:]


@functools.partial(
    jax.jit, static_argnames=("ref_tile", "query_tile", "interpret")
)
def match_transform_pallas(queries: jnp.ndarray, ref_planes, H: jnp.ndarray,
                           *, ref_tile: int = 2048, query_tile: int = 1024,
                           interpret: bool = False):
    """1-NN of `queries` among `apply_H(refs, H)` without materializing the
    transformed cloud.

    Args:
        queries: (q, 3) fixed-side correspondence points.
        ref_planes: (rx, ry, rz) coordinate planes of shape (1, n_pad) with
            n_pad a multiple of ref_tile — build once per registration with
            `pad_ref_planes` (padded lanes carry far-away coords so they
            never win the argmin). Loop-invariant: XLA hoists the planes
            out of the ICP while_loop.
        H: (4, 4) or (3, 4) rigid transform applied to the refs in-kernel.

    Returns:
        (dist2, idx) with shapes (q,), (q,) int32 — squared distance to and
        index of the nearest transformed reference.

    Numerics: the in-kernel transform evaluates
    `((h0*x + h1*y) + h2*z) + h3` per coordinate in f32; the lax path's
    `apply_H` matmul may associate differently on TPU, so results agree to
    f32 rounding (argmins can differ only for near-equidistant pairs).
    """
    n_q = queries.shape[0]
    dtype = queries.dtype
    q_pad = (-n_q) % query_tile
    Q = jnp.pad(queries, ((0, q_pad), (0, 0)))
    rx, ry, rz = ref_planes
    n_pad = rx.shape[1]
    assert n_pad % ref_tile == 0, "pad ref planes to a ref_tile multiple"
    n_q_tiles = (n_q + q_pad) // query_tile
    n_r_tiles = n_pad // ref_tile

    plane_spec = pl.BlockSpec(
        (1, ref_tile), lambda qi, ri: (0, ri), memory_space=pltpu.VMEM
    )
    d2, idx = pl.pallas_call(
        functools.partial(_match_transform_kernel, ref_tile=ref_tile),
        grid=(n_q_tiles, n_r_tiles),
        in_specs=[
            pl.BlockSpec((3, 4), lambda qi, ri: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((query_tile, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            plane_spec, plane_spec, plane_spec,
        ],
        out_specs=[
            pl.BlockSpec((query_tile,), lambda qi, ri: (qi,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile,), lambda qi, ri: (qi,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q_tiles * query_tile,), dtype),
            jax.ShapeDtypeStruct((n_q_tiles * query_tile,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile,), dtype),
            pltpu.VMEM((query_tile,), jnp.int32),
        ],
        interpret=interpret,
    )(H[:3, :4], Q, rx, ry, rz)
    return d2.reshape(-1)[:n_q], idx.reshape(-1)[:n_q]


def pad_ref_planes(refs: jnp.ndarray, ref_tile: int = 2048):
    """(rx, ry, rz) coordinate planes of `refs` padded to a ref_tile
    multiple with far-away coordinates (padded lanes always lose the
    argmin; `_BIG`-scale coords keep (q - r)^2 finite in f32)."""
    n_r = refs.shape[0]
    r_pad = (-n_r) % ref_tile
    far = jnp.asarray(1e15, refs.dtype)
    R = jnp.pad(refs, ((0, r_pad), (0, 0)), constant_values=0.0)
    valid = (jnp.arange(n_r + r_pad) < n_r)[:, None]
    R = jnp.where(valid, R, far)
    return R[:, 0][None, :], R[:, 1][None, :], R[:, 2][None, :]


@functools.partial(
    jax.jit, static_argnames=("ref_tile", "query_tile", "interpret")
)
def nn_search_pallas(queries: jnp.ndarray, refs: jnp.ndarray, *,
                     ref_tile: int = 2048, query_tile: int = 1024,
                     ref_mask: jnp.ndarray | None = None,
                     interpret: bool = False):
    """Single nearest neighbor of each query among refs (Pallas TPU kernel).

    Same contract as ops/knn.nn_search: returns (dist2, idx) of shapes
    (q,), (q,) int32; masked/absent references are never selected and yield
    dist2 >= _BIG (callers using radius gates never observe those values).

    Args:
        interpret: run in the Pallas interpreter (CPU testing).
    """
    n_q, n_r = queries.shape[0], refs.shape[0]
    dtype = queries.dtype

    q_pad = (-n_q) % query_tile
    r_pad = (-n_r) % ref_tile
    Q = jnp.pad(queries, ((0, q_pad), (0, 0)))
    R = jnp.pad(refs, ((0, r_pad), (0, 0)))
    valid = jnp.arange(n_r + r_pad, dtype=jnp.int32) < n_r
    if ref_mask is not None:
        valid = valid & jnp.pad(ref_mask, (0, r_pad))
    maskf = valid.astype(dtype)

    # Coordinate planes as (1, N) rows: the lane dimension is the reference
    # axis, which the kernel broadcasts against (TQ, 1) query columns.
    rx = R[:, 0][None, :]
    ry = R[:, 1][None, :]
    rz = R[:, 2][None, :]
    maskf = maskf[None, :]

    n_q_tiles = (n_q + q_pad) // query_tile
    n_r_tiles = (n_r + r_pad) // ref_tile

    plane_spec = pl.BlockSpec(
        (1, ref_tile), lambda qi, ri: (0, ri), memory_space=pltpu.VMEM
    )
    d2, idx = pl.pallas_call(
        functools.partial(_nn_kernel, ref_tile=ref_tile),
        grid=(n_q_tiles, n_r_tiles),
        in_specs=[
            pl.BlockSpec(
                (query_tile, 3), lambda qi, ri: (qi, 0),
                memory_space=pltpu.VMEM,
            ),
            plane_spec, plane_spec, plane_spec, plane_spec,
        ],
        # 1D outputs with 1024-multiple blocks: XLA lays out 1D f32/i32
        # arrays with T(1024) tiling on TPU, and Mosaic requires the block
        # to match it (512 blocks or (1, n) 2D blocks are both rejected).
        out_specs=[
            pl.BlockSpec((query_tile,), lambda qi, ri: (qi,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile,), lambda qi, ri: (qi,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q_tiles * query_tile,), dtype),
            jax.ShapeDtypeStruct((n_q_tiles * query_tile,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile,), dtype),
            pltpu.VMEM((query_tile,), jnp.int32),
        ],
        interpret=interpret,
    )(Q, rx, ry, rz, maskf)
    return d2.reshape(-1)[:n_q], idx.reshape(-1)[:n_q]
