"""Dilated-occupancy overlap gate: gather-free radius-existence test at scale.

The overlap gate (reference: cKDTree.query with distance_upper_bound,
/root/reference/python/simpleicp/pointcloud.py:161-171) only needs a BOOLEAN
per fixed point: does ANY movable point lie within `max_overlap_distance`?
(models/icp.py consumes nothing but `d2 <= r^2`.) Measured on the TPU, every
per-query candidate GATHER costs ~8-10 ns/element whatever its form (element,
slab, planar — scripts/probe_sort_join*.py), which caps any cell-list scan at
~1e9 gathered candidates; a 12.5M x 12.5M gate wants ~1e10. This module
answers the existence question with NO per-query candidate gathers:

  1. bin the movable cloud into cells of size ~radius/16 over a dense 3D
     grid, bit-packed 32 z-cells per uint32 word (host-side
     `np.bitwise_or.at` — the one scatter-OR no accelerator primitive
     covers — on the device-transformed cloud fetched once);
  2. dilate the occupancy bitmap with two conservative stencils on device:
       IN   = cells whose every point is certainly within (r - margin) of
              some movable point:   a*sqrt(sum (|d|+1)^2) <= r - margin
       POSS = cells that could possibly have a movable point within
              (r + margin):         a*sqrt(sum max(|d|-1,0)^2) <= r + margin
     The dilation walks z-radius levels incrementally (two packed bit-shift
     ORs per level) and applies each level's (dx, dy) offsets as dynamic
     2-D rolls inside a `lax.fori_loop` — no per-entry recompilation, no
     gathers, bandwidth-sequential over the word grid.
  3. classify each fixed point by ONE word-gather + bit test per bitmap:
     IN -> selected; not POSS -> rejected; the thin band between them gets
     EXACT distance checks (chunked dense VPU sweeps, ops/knn.py).

Bit-packing is what buys the fine lattice: a radius/16 cell over the same
bounding box costs 64x more cells than radius/4 but only 2x more MEMORY
than an unpacked radius/4 byte-grid, and the band (the only part that pays
exact distance work) shrinks linearly with the cell size — measured on the
12.5M tiled-dragon case from ~13% of queries (cell r/4) to ~2-3% (r/16).

The margin absorbs every floating-point discrepancy between the host-side
packing, the device binning, and the device distance checks, always erring
toward the band (= toward exact resolution), so the final mask equals the
exact `min_dist <= r` predicate bit for bit.

Applicability: needs a dense word grid over the joint bounding box —
`plan_dilate_gate` returns None when no cell division fits `max_words`,
and the caller falls back to the hash-grid or brute engines. Real scan
data (surface-like, extent up to ~10^4 x radius) fits easily; the limit
only excludes extreme volumetric extents.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class DilatePlan(NamedTuple):
    """Host-computed static plan of one dilated-occupancy gate."""

    origin: Tuple[float, float, float]   # grid origin (f64, includes border)
    inv_cell: float                      # 1 / cell size (f64)
    dims: Tuple[int, int, int]           # grid dims in CELLS incl. border
    in_offsets: Tuple[Tuple[int, int, int], ...]    # (dx, dy, z_rad)
    poss_offsets: Tuple[Tuple[int, int, int], ...]  # (dx, dy, z_rad)
    n_cells: int
    wz: int                              # uint32 words along z (= ceil(dz/32))
    n_words: int                         # dims[0] * dims[1] * wz


def _stencil(radius_cells: float, criterion) -> Tuple[Tuple[int, int, int], ...]:
    """(dx, dy, z_rad) triples: dz in [-z_rad, z_rad] satisfies `criterion`
    (monotone in |dz|, so the dz-range per (dx, dy) is contiguous)."""
    r_int = int(np.ceil(radius_cells)) + 1
    out = []
    for dx in range(-r_int, r_int + 1):
        for dy in range(-r_int, r_int + 1):
            if not criterion(dx, dy, 0):
                continue
            z = 0
            while criterion(dx, dy, z + 1):
                z += 1
            out.append((dx, dy, z))
    return tuple(out)


@jax.jit
def bbox_of(Xf, Xm, H0):
    """Bounding box of the H0-transformed MOVABLE cloud, on device — so gate
    planning never fetches full clouds. The grid only needs to cover the
    movable cloud + stencil border: any query beyond it clips to the
    outermost border layer, which dilation can never reach (POSS extends at
    most border-1 cells past an occupied cell), so far queries classify as
    rejected without the fixed cloud inflating the grid. (`Xf` is accepted
    for signature stability but does not shape the box.)"""
    del Xf
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    return jnp.min(Xm0, axis=0), jnp.max(Xm0, axis=0)


def plan_dilate_gate(
    X_fix: np.ndarray,
    X_mov0: np.ndarray,
    radius: float,
    *,
    cell_div: Optional[int] = None,
    max_words: int = 1 << 28,
    max_shift_words: int = 1 << 38,
    bbox: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Optional[DilatePlan]:
    """Build the static gate plan on the host (numpy f64).

    Args:
        X_fix: accepted for signature stability; the grid covers only the
            movable cloud (see `bbox_of` — far queries clip to the
            never-POSS border and classify as rejected).
        X_mov0: (nm, 3) movable cloud AFTER the initial transform (the
            references; compute with the same H0 the device applies).
        radius: max_overlap_distance.
        cell_div: cells per radius (cell = radius / cell_div). Finer cells
            narrow the uncertain band (fewer exact checks) at the cost of
            a larger word grid and bigger stencils; None picks the largest
            of 16/8/4/2 that fits both budgets. Capped at 16 so stencil
            z-radii stay < 32 (single-word bit shifts).
        max_words: packed-grid memory budget in uint32 words (default
            2^28 = 1 GB per grid); None is returned beyond it (caller
            falls back to the hash-grid engine).
        max_shift_words: dilation COMPUTE budget — n_words x total stencil
            entries, i.e. word-traffic of the shift/OR passes (before the
            ~8x batching reuse). Default 2^38 keeps the dilation to a few
            device-seconds.

    Returns:
        DilatePlan, or None when no cell division fits the budgets.
    """
    if bbox is not None:
        lo, hi = np.asarray(bbox[0], np.float64), np.asarray(bbox[1], np.float64)
    else:
        Xm = np.asarray(X_mov0, np.float64)
        if Xm.size == 0:
            return None
        lo = Xm.min(axis=0)
        hi = Xm.max(axis=0)
    if not (np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))):
        return None
    if cell_div is None:
        for div in (16, 8, 4, 2):
            plan = plan_dilate_gate(
                None, None, radius, cell_div=div, max_words=max_words,
                max_shift_words=max_shift_words, bbox=(lo, hi),
            )
            if plan is not None:
                return plan
        return None
    if cell_div > 16:
        raise ValueError("cell_div must be <= 16 (packed z shifts)")
    cell = float(radius) / cell_div

    # Border: stencil reach + 1 so axis rolls wrap only through empty cells,
    # + 1 for the f32 binning slop at the box faces.
    a_cells = cell_div  # radius in cells
    border = int(np.ceil(a_cells)) + 3
    dims_f = np.ceil((hi - lo) / cell) + 1 + 2 * border
    dims = tuple(int(d) for d in dims_f)
    wz = -(-dims[2] // 32)
    n_words = dims[0] * dims[1] * wz
    if n_words > max_words:
        return None
    origin = tuple(float(v) for v in (lo - border * cell))

    # Margin: covers f32 binning error (a point may sit outside its assigned
    # cell by ~eps32 * |p - origin|), f32 distance-check rounding, AND the
    # host-vs-device transform discrepancy (classify_queries may bin a
    # host-transformed copy of the movable cloud while the exact sweeps use
    # the device-transformed one; both land within a few ulp of the same
    # coordinates, so the positional error is O(eps32 * extent)). Always
    # shrinks IN and grows POSS -> band -> exact resolution.
    extent = float(np.max(hi - lo)) + 2 * border * cell
    margin = 16.0 * np.finfo(np.float32).eps * extent + 1e-12

    r_in = (float(radius) - margin) / cell     # in cell units
    r_poss = (float(radius) + margin) / cell

    def crit_in(dx, dy, dz):
        return (abs(dx) + 1) ** 2 + (abs(dy) + 1) ** 2 + (abs(dz) + 1) ** 2 <= r_in ** 2

    def crit_poss(dx, dy, dz):
        return (
            max(abs(dx) - 1, 0) ** 2
            + max(abs(dy) - 1, 0) ** 2
            + max(abs(dz) - 1, 0) ** 2
            <= r_poss ** 2
        )

    in_offsets = _stencil(a_cells, crit_in)
    poss_offsets = _stencil(a_cells, crit_poss)
    if n_words * (len(in_offsets) + len(poss_offsets)) > max_shift_words:
        return None
    return DilatePlan(
        origin=origin,
        inv_cell=1.0 / cell,
        dims=dims,
        in_offsets=in_offsets,
        poss_offsets=poss_offsets,
        n_cells=int(np.prod(dims)),
        wz=wz,
        n_words=n_words,
    )


def _cells_of(points, origin, inv_cell, dims):
    k = jnp.floor((points - origin) * inv_cell).astype(jnp.int32)
    # Clamp into the (bordered) grid: only f32 slop at the box faces can
    # push a key out of range, and the border cell it lands in is empty for
    # refs / harmless for queries (the margin already routed such boundary
    # geometry into the band).
    return jnp.clip(k, 0, jnp.asarray(dims, jnp.int32) - 1)


def pack_occupancy(Xm0: np.ndarray, plan: DilatePlan, dtype) -> np.ndarray:
    """Host: bin the (already initial-transformed) movable cloud and OR its
    occupancy bits into the packed word grid. Binning replicates the device
    arithmetic exactly (same dtype, same (p - origin) * inv_cell form), so
    host refs and device queries see one lattice; any residual boundary
    flip is covered by the plan margin."""
    dt = np.dtype(dtype)
    X = np.asarray(Xm0, dt)
    origin = np.asarray(plan.origin, dt)
    inv = dt.type(plan.inv_cell)
    if dt in (np.float32, np.float64):
        try:
            from ..native import pack_occupancy_native

            return pack_occupancy_native(
                X, origin, plan.inv_cell, plan.dims, plan.wz
            )
        except ImportError:
            pass  # no compiler: serial numpy fallback below
    k = np.floor((X - origin) * inv).astype(np.int64)
    np.clip(k, 0, np.asarray(plan.dims, np.int64) - 1, out=k)
    # layout (wz, nx, ny): the two LARGE dims are minor, so TPU (8, 128)
    # tile padding wastes ~4% instead of 2.4x (53 -> 128 on a z-minor
    # layout OOM'd the classify program at the 12.5M scale).
    widx = (
        (k[:, 2] >> 5) * (plan.dims[0] * plan.dims[1])
        + k[:, 0] * plan.dims[1] + k[:, 1]
    )
    val = np.uint32(1) << (k[:, 2] & 31).astype(np.uint32)
    grid = np.zeros(plan.n_words, np.uint32)
    np.bitwise_or.at(grid, widx, val)
    return grid


@functools.partial(jax.jit, static_argnames=("plan",))
def _pack_occupancy_device(P, *, plan: DilatePlan):
    """Device: occupancy pack of already-transformed points — the
    accelerator replacement for the host `pack_occupancy` path, so no
    cloud bytes ever cross the tunnel (measured: fetching the transformed
    cloud cost 6-9 s and the packed-grid upload ~6 s inside the classify
    flow at 12.5M points; scripts/diag_dilate.py).

    No scatter-OR primitive exists, but one isn't needed: sort the
    (word, bit) pairs (2-key lexicographic `lax.sort`), zero out adjacent
    duplicates, and the surviving values per word are DISTINCT powers of
    two — their scatter-ADD is exactly the bitwise OR. Duplicates are
    routed out of bounds and dropped.
    """
    dims = plan.dims
    k = _cells_of(
        P, jnp.asarray(plan.origin, P.dtype),
        jnp.asarray(plan.inv_cell, P.dtype), dims,
    )
    widx = (
        (k[:, 2] >> 5) * (dims[0] * dims[1])
        + k[:, 0] * dims[1] + k[:, 1]
    )
    bit = k[:, 2] & 31
    ws, bs = lax.sort((widx, bit), num_keys=2)
    dup = jnp.concatenate([
        jnp.zeros((1,), bool), (ws[1:] == ws[:-1]) & (bs[1:] == bs[:-1]),
    ])
    val = jnp.where(dup, jnp.uint32(0), jnp.uint32(1) << bs.astype(jnp.uint32))
    tgt = jnp.where(dup, jnp.int32(plan.n_words), ws)
    zero = jnp.zeros(plan.n_words, jnp.uint32)
    return zero.at[tgt].add(val, mode="drop")


@functools.partial(jax.jit, static_argnames=("plan", "cap"))
def _band_subset_on_device(Xf, band_mask, *, plan: DilatePlan, cap: int):
    """Gather (up to `cap`) band-query rows from the mask ON DEVICE —
    `nonzero(size=cap)` is a cumsum + scatter, O(nf) elementwise work,
    far cheaper than dragging the full query cloud through the packed
    sort (the pack's 2-key lexicographic sort is the expensive part; this
    keeps it at band size like the host-index path, without the host
    fetch + nonzero + index re-upload on the critical path).

    Fill rows (when the band is smaller than cap) use index 0 — a real
    query, so downstream consumers only keep a few extra refs near Xf[0].
    If the true band EXCEEDS cap, nonzero truncates: dropped band queries
    could lose the refs they need, so the CALLER must validate the band
    count against cap (host-side, after the batched mask fetch) and
    discard/redo on overflow."""
    idx = jnp.nonzero(band_mask, size=cap, fill_value=0)[0]
    return Xf[jnp.clip(idx, 0, Xf.shape[0] - 1)]


def _zshift_up(occ, k):
    """Packed occupancy shifted +k cells along z (k static, 1 <= k < 32):
    in-word bit shift + carry bits from the -z neighbor word. The first
    word's carry source is zero (below the grid is empty)."""
    zero = jnp.zeros_like(occ[:1])
    prev = jnp.concatenate([zero, occ[:-1]], axis=0)
    return (occ << k) | (prev >> (32 - k))


def _zshift_dn(occ, k):
    zero = jnp.zeros_like(occ[:1])
    nxt = jnp.concatenate([occ[1:], zero], axis=0)
    return (occ >> k) | (nxt << (32 - k))


_ROLL_BATCH = 8  # dilation rolls fused per fori step (see _dilate_packed)


def _dilate_packed_multi(occ, offsets_list):
    """OR of `occ` shifted by every (dx, dy, dz) each stencil describes,
    on the packed (x, y, z-words) grid — one output grid per stencil,
    computed in a single fused pass. Fusing the classify's IN + POSS pair
    shares the incremental z-expansion AND the per-level padded copy of
    oz: both stencils cover the same z-levels over the same occupancy, so
    running them separately pays the oz prologue and the full-grid
    `jnp.pad` stream twice for no reason.

    z-radius levels run incrementally (oz grows by two packed shift-ORs per
    level); each level's (dx, dy) offsets are applied as dynamic-offset
    window reads of a ZERO-PADDED copy of oz inside one fori_loop over a
    small index table — the jaxpr stays tiny no matter how large the
    stencil (at cell_div=16 the POSS stencil has ~900 entries; unrolled
    that would be a multi-minute compile, and `jnp.roll` with traced
    shifts would lower to concat + slice, doubling traffic). The padding
    is zeros = empty cells, exactly what lives beyond the plan border, so
    a shifted window never reads phantom occupancy. Reads are batched
    _ROLL_BATCH per fori step: one step's windows overlap almost entirely
    (shifts are at most +/-(div+2) cells), so the fused kernel re-reads
    cached tiles instead of streaming the grid once per entry. Padding a
    short batch with (0, 0) is harmless: the (0, 0) column always carries
    the stencil's maximal z-radius, so OR-ing oz unshifted adds a subset
    of what the stencil already covers."""
    by_zs = []
    for offsets in offsets_list:
        by_z = {}
        for dx, dy, z in offsets:
            by_z.setdefault(z, []).append((dx, dy))
        by_zs.append(by_z)
    live = [i for i, b in enumerate(by_zs) if b]
    if not live:
        return [jnp.zeros_like(occ) for _ in offsets_list]
    z_max = max(max(by_zs[i]) for i in live)
    P = max(
        max(abs(dx), abs(dy))
        for i in live
        for dx, dy, _ in offsets_list[i]
    )
    wz, nx, ny = occ.shape
    outs = [jnp.zeros_like(occ) for _ in offsets_list]
    oz = occ
    K = _ROLL_BATCH
    for z in range(z_max + 1):
        if z > 0:
            oz = oz | _zshift_up(occ, z) | _zshift_dn(occ, z)
        if not any(by_zs[i].get(z) for i in live):
            continue
        oz_p = jnp.pad(oz, ((0, 0), (P, P), (P, P)))
        for i in live:
            ents = by_zs[i].get(z)
            if not ents:
                continue
            n_b = -(-len(ents) // K)
            padded = list(ents) + [(0, 0)] * (n_b * K - len(ents))
            table = jnp.asarray(padded, jnp.int32).reshape(n_b, K, 2)

            def body(j, acc, table=table, oz_p=oz_p):
                row = table[j]
                for t in range(K):
                    # window at (dx, dy): padded[P - dx : ..., P - dy : ...]
                    acc = acc | lax.dynamic_slice(
                        oz_p,
                        (jnp.int32(0), P - row[t, 0], P - row[t, 1]),
                        (wz, nx, ny),
                    )
                return acc

            outs[i] = lax.fori_loop(0, n_b, body, outs[i])
    return outs


def _dilate_packed(occ, offsets):
    """Single-stencil dilation (see _dilate_packed_multi)."""
    return _dilate_multi(occ, [offsets])[0]


# Route dilations through the hand-scheduled Pallas stencil kernel
# (ops/dilate_pallas.py). Bit-validated on hardware across the production
# geometries, but OFF by default: its per-entry dynamic rotates lose to
# XLA's batched dynamic-slice streams at the 12.5M geometry (~3.0 s vs
# 2.26 s), and the static-slice form that would win stalls the Mosaic
# compiler (>25 min on the ~1600-entry production stencils). Kept as a
# validated alternative + the record of a real Mosaic dynamic_rotate
# negative-shift miscompile it uncovered (see dilate_pallas docstring).
_USE_PALLAS_DILATE = False


def _dilate_multi(occ, offsets_list):
    if _USE_PALLAS_DILATE and jax.default_backend() == "tpu":
        from .dilate_pallas import dilate_packed_multi_pallas

        out = dilate_packed_multi_pallas(occ, offsets_list)
        if out is not None:
            return out
    return _dilate_packed_multi(occ, offsets_list)


@functools.partial(jax.jit, static_argnames=("plan",))
def _classify_packed(Xf, occ_words, *, plan: DilatePlan):
    """Device: two packed dilations + one word gather + bit test per query.

    Returns (in_mask, band_mask): selected-for-sure / needs exact check.
    """
    dtype = Xf.dtype
    origin = jnp.asarray(plan.origin, dtype)
    inv_cell = jnp.asarray(plan.inv_cell, dtype)
    dims = plan.dims
    occ = occ_words.reshape(plan.wz, dims[0], dims[1])

    in_grid, poss_grid = _dilate_multi(
        occ, [plan.in_offsets, plan.poss_offsets]
    )

    kq = _cells_of(Xf, origin, inv_cell, dims)
    widx = (
        (kq[:, 2] >> 5) * (dims[0] * dims[1])
        + kq[:, 0] * dims[1] + kq[:, 1]
    )
    bit = (kq[:, 2] & 31).astype(jnp.uint32)
    in_w = in_grid.reshape(-1)[widx]
    poss_w = poss_grid.reshape(-1)[widx]
    in_mask = ((in_w >> bit) & 1).astype(bool)
    poss_mask = ((poss_w >> bit) & 1).astype(bool)
    return in_mask, poss_mask & ~in_mask


@jax.jit
def _transform(Xm, H0):
    return Xm @ H0[:3, :3].T + H0[:3, 3]


@jax.jit
def _transform_cols(Xm, H0):
    """Transformed movable cloud as three FLAT arrays: a (n, 3) device->host
    fetch through the tunnel runs far below line rate (minor-dim-3 layout),
    while flat 1-D fetches hit full bandwidth. Used only when no host copy
    of the cloud exists."""
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    return Xm0[:, 0], Xm0[:, 1], Xm0[:, 2]


# Pack the occupancy on device (transform + sort + scatter-add, zero tunnel
# traffic). The host path (fetch/transform + pack_occupancy + 569 MB upload)
# remains as a measured fallback; flip for A/B diagnostics.
_DEVICE_PACK = True


def classify_queries(Xf, Xm, H0, *, plan: DilatePlan,
                     Xm_host: Optional[np.ndarray] = None,
                     block: bool = True):
    """Full classify: pack the transformed movable cloud's occupancy and run
    the packed dilation classify, all on device (`_pack_occupancy_device`) —
    no cloud fetch, no grid upload.

    The `_DEVICE_PACK = False` fallback packs on the host instead: from
    `Xm_host` (the UNtransformed movable cloud as a host array) via an f64
    host transform when given, else by fetching the device-transformed
    cloud as three flat columns. Host-vs-device packs agree up to a few-ulp
    binning slop that the plan margin absorbs (see plan_dilate_gate).

    Returns (in_mask, band_mask) device arrays. `block=False` skips the
    barrier (and the per-stage timing log) so the caller can enqueue
    dependent device programs behind the classify without a host roundtrip.
    """
    import logging
    import time

    log = logging.getLogger(__name__)
    t0 = time.perf_counter()
    if _DEVICE_PACK:
        occ_dev = _pack_occupancy_device(_transform(Xm, H0), plan=plan)
        t1 = t2 = time.perf_counter()
    else:
        if Xm_host is not None:
            H0_np = np.asarray(H0, np.float64)
            Xm0 = (np.asarray(Xm_host, np.float64) @ H0_np[:3, :3].T
                   + H0_np[:3, 3])
        else:
            cols = _transform_cols(Xm, H0)
            Xm0 = np.stack([np.asarray(c) for c in cols], axis=1)
        t1 = time.perf_counter()
        occ_dev = jnp.asarray(pack_occupancy(Xm0, plan, Xf.dtype))
        t2 = time.perf_counter()
    out = _classify_packed(Xf, occ_dev, plan=plan)
    if not block:
        return out
    out = jax.block_until_ready(out)
    t3 = time.perf_counter()
    log.debug(
        "dilate gate:   classify detail: obtain Xm0 %.2fs, pack %.2fs, "
        "device pack+classify %.2fs (n_words %d, stencils %d+%d)",
        t1 - t0, t2 - t1, t3 - t2, plan.n_words,
        len(plan.in_offsets), len(plan.poss_offsets),
    )
    return out


@functools.partial(jax.jit, static_argnames=("plan", "cap"))
def _compact_refs_device(Xf, band_mask, Xm, H0, *, plan: DilatePlan,
                         cap: int):
    """Device, one program, on the CLASSIFY lattice: mark each (transformed)
    movable point that could be within `radius` of ANY band query — pack
    the band queries' own occupancy, POSS-dilate it, bit-test each ref's
    cell. Refs outside the dilation are provably farther than the radius
    from every band query (crit_poss lower-bounds cell-to-cell point
    distance) and can be dropped from the band sweep.

    Reusing the classify plan (instead of planning a fresh lattice over the
    band bbox) keeps everything on device with no new grid geometry: the
    measured fresh-lattice version spent ~10 s/call at the 12.5M scale on
    host packing + grid upload; this one is ~2 s (one POSS dilation).

    Band queries can sit outside the grid (it covers only the movable
    cloud); `_cells_of` clamps them to the border. Clamping moves the
    query's cell TOWARD any in-grid ref cell along each axis, and
    crit_poss is monotone in per-axis |offset|, so the filter stays
    conservative. Taking the band MASK (not gathered indices) lets the
    caller enqueue this program directly behind the classify, before any
    mask bytes reach the host; `cap` semantics (fill rows / overflow
    validation) per `_band_subset_on_device`.
    """
    band_q = _band_subset_on_device(Xf, band_mask, plan=plan, cap=cap)
    occ_b = _pack_occupancy_device(band_q, plan=plan)
    dims = plan.dims
    poss_b = _dilate_packed(
        occ_b.reshape(plan.wz, dims[0], dims[1]), plan.poss_offsets
    )
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    k = _cells_of(
        Xm0, jnp.asarray(plan.origin, Xm.dtype),
        jnp.asarray(plan.inv_cell, Xm.dtype), dims,
    )
    widx = (
        (k[:, 2] >> 5) * (dims[0] * dims[1])
        + k[:, 0] * dims[1] + k[:, 1]
    )
    bit = (k[:, 2] & 31).astype(jnp.uint32)
    grid = poss_b.reshape(-1)
    return ((grid[widx] >> bit) & 1).astype(bool)


@functools.partial(jax.jit, static_argnames=("axes",))
def _gather_query_coords2(Xf, idx, *, axes):
    P = Xf[jnp.clip(idx, 0, Xf.shape[0] - 1)]
    return jnp.stack([P[:, axes[0]], P[:, axes[1]]])


@functools.partial(jax.jit, static_argnames=("axes",))
def _gather_ref_coords2(Xm, H0, idx, *, axes):
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    P = Xm0[jnp.clip(idx, 0, Xm.shape[0] - 1)]
    return jnp.stack([P[:, axes[0]], P[:, axes[1]]])


@jax.jit
def _pack_bits(mask):
    return jnp.packbits(mask)


def _fetch_mask(mask_dev) -> np.ndarray:
    """Fetch a device bool mask as PACKED bits (8x fewer bytes through the
    tunnel — the post-big-program transfer stall is bandwidth-proportional,
    so at 50M queries this turns three ~50 MB mask fetches into ~6 MB
    each)."""
    return _fetch_masks(mask_dev)[0]


def _fetch_masks(*masks) -> list:
    """Fetch several device bool masks: enqueue EVERY pack program before
    the first blocking host read, so later packs run while earlier bytes
    are in flight (dispatch is async; np.asarray is the barrier)."""
    packed = [_pack_bits(m) for m in masks]
    return [
        np.unpackbits(np.asarray(p), count=m.shape[0]).astype(bool)
        for p, m in zip(packed, masks)
    ]


@jax.jit
def _gather_ref_rows(Xm, H0, idx):
    """Transformed movable rows by index — materializes the slab-ordered
    reference array the blocked sweep slices from."""
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    return Xm0[jnp.clip(idx, 0, Xm.shape[0] - 1)]


@functools.partial(jax.jit, static_argnames=("W",))
def _min_d2_sliced_blocks(Xf, QB, starts, Rsorted, *, W: int):
    """Blocked sweep: for block b, min squared distance from the S1 indexed
    queries QB[b] to the W-row slice Rsorted[starts[b] : starts[b]+W].

    One program sweeps ALL blocks (lax.map), replacing a per-block dispatch
    (~35 ms tunnel latency each). Slices over-cover their block's exact
    candidate window; every extra row is still a real transformed movable
    point, which can only (correctly) lower a query's min — the predicate
    stays exact (see overlap_mask_dilate)."""
    from .knn import min_dist_sq

    S1 = QB.shape[1]

    def blk(pair):
        qi, j0 = pair
        Q = Xf[jnp.clip(qi, 0, Xf.shape[0] - 1)]
        R = lax.dynamic_slice(Rsorted, (j0, jnp.int32(0)), (W, 3))
        return min_dist_sq(
            Q, R, ref_tile=min(65536, max(8, W)),
            query_tile=min(2048, S1), layout="tq",
        )

    return lax.map(blk, (QB, starts))


@jax.jit
def _min_d2_subset(Xf, q_idx, Xm, H0, ref_idx):
    """Min squared distance from the indexed queries to the indexed
    (transformed) movable points — the dense VPU sweep on compacted sets."""
    from .knn import min_dist_sq

    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    Q = Xf[jnp.clip(q_idx, 0, Xf.shape[0] - 1)]
    R = Xm0[jnp.clip(ref_idx, 0, Xm.shape[0] - 1)]
    # tq layout: measured 26% faster than qt at band-sweep shapes
    # (262144 x 12.5M: 10.7 vs 14.4 s, scripts/diag_dilate.py)
    return min_dist_sq(Q, R, ref_tile=65536, layout="tq")


@jax.jit
def _min_d2_full(Xf, q_idx, Xm, H0):
    from .knn import min_dist_sq

    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    Q = Xf[jnp.clip(q_idx, 0, Xf.shape[0] - 1)]
    return min_dist_sq(Q, Xm0, ref_tile=65536, layout="tq")


def _pow2_pad(idx: np.ndarray) -> np.ndarray:
    n_pad = 1 << max(int(np.ceil(np.log2(max(idx.size, 1)))), 10)
    out = np.zeros(n_pad, np.int32)
    out[: idx.size] = idx
    return out


def _bucket_size(n: int) -> int:
    """Next {2^k, 1.5*2^k} bucket (>= 1024): max 33% padding waste vs
    100% for plain pow2, at the cost of at most 2x the distinct compiled
    shapes."""
    n = max(n, 1024)
    return min(
        s
        for k in range(10, 32)
        for s in (1 << k, 3 << (k - 1))
        if s >= n
    )


# Pair budget per device call: ~4e12 exact-distance pairs is a few seconds
# of VPU time. Splitting the sweep host-side bounds every device program's
# runtime (the TPU runtime watchdog kills multi-minute programs — round 1
# lost the hash-grid gate to exactly that) at the cost of one ~32 ms tunnel
# roundtrip per extra chunk.
_SWEEP_PAIR_BUDGET = 1 << 42
# Band x kept-ref products above this run the SLAB JOIN instead of one
# global sweep: sort both sides along the longest lattice axis, chunk the
# queries, and sweep each chunk only against refs within `radius` of its
# coordinate range (a ref farther than the radius along ONE axis cannot
# satisfy d2 <= r^2, so the restriction is exact). Measured at 50M x 50M:
# the global sweep was 2.0M x 11.1M = 2.2e13 pairs = 77 s of VPU time; the
# slab join cuts the pair count by the extent/radius locality factor.
# The join is BLOCKED and 2-D (_blocked_slab_join): a second restriction
# along the next-longest axis within each slab multiplies the locality
# factor again, and all blocks sweep in a few lax.map programs against
# dynamic_slice windows of one slab-ordered ref array (no per-block
# dispatch, no per-block gathers).
_SLAB_SWEEP_MIN = 1 << 40
# Candidate x-slab sizes for the blocked slab join. Smaller slabs narrow
# each slab's ref x-window but multiply host planning (per-slab sorts);
# the y-restriction inside each slab means large slabs no longer pay
# proportionally more pairs — _pick_slab_chunk_2d models both axes from
# the sorted coordinates and picks the cheapest.
_SLAB_CHUNK_OPTS = (1 << 13, 1 << 14, 1 << 15, 1 << 16, 1 << 17, 1 << 18,
                    1 << 19)
_SLAB_PAIRS_PER_SEC = 2.0e11   # measured dense-sweep throughput (tq tiles)
_SLAB_CALL_SEC = 0.035         # tunnel dispatch+fetch per device program
_SLAB_HOST_SORT_SEC = 3e-8     # native radix argsort, per element
# Minimum y-sub-chunk size of the blocked 2-D slab join (the second
# restriction axis). Tests lower it to exercise multi-block slabs.
_SLAB1_MIN = 1 << 12


def _argsort_host(keys: np.ndarray) -> np.ndarray:
    """Stable ascending argsort for slab planning: the native parallel
    radix sort when built (11M f64 keys: ~2 s numpy mergesort -> ~0.3 s),
    numpy otherwise. The join is tie-order independent (windows only need
    nondecreasing keys), so the native sort's -0.0/+0.0 tie deviation from
    numpy is immaterial here."""
    if keys.size >= (1 << 16):
        try:
            from ..native import argsort_native

            return argsort_native(keys)
        except (ImportError, TypeError):
            pass
    return np.argsort(keys, kind="stable")


def _block_bucket(n: int) -> int:
    """{2^k, 1.5*2^k} bucket with a small floor — block counts are two
    orders below point counts, so a 1024 floor would be all padding."""
    n = max(n, 8)
    return min(
        s
        for k in range(3, 32)
        for s in (1 << k, 3 << (k - 1))
        if s >= n
    )


def _slab1_of(S0: int) -> int:
    """y-sub-chunk size paired with an x-slab size S0."""
    return max(_SLAB1_MIN, min(S0 >> 4, 1 << 15))


def _pick_slab_chunk_2d(qx_sorted: np.ndarray, qy: np.ndarray,
                        rx_sorted: np.ndarray, ry: np.ndarray,
                        reach: float) -> int:
    """Choose the x-slab size S0 minimizing the blocked 2-D join's
    estimated cost. All host-side numpy on the x-sorted coordinates
    (`qy`/`ry` aligned with the sorted x arrays).

    Per candidate S0, each slab's ref x-window comes from two
    searchsorteds; the y-restriction inside the slab is modeled
    statistically: a y-sub-chunk of S1 queries spans ~qy_span * S1/ns, so
    its candidate run of the y-sorted window is ~w * (sub_span + 2*reach)
    / ry_span under a roughly uniform y distribution (+15% for the
    {2^k, 1.5*2^k} width buckets; the fill-sorted per-call W_g grouping
    keeps real padding near that). Cost = padded pairs / VPU throughput
    + device programs * dispatch + per-element host sort work. The old
    1-D model (pairs without the y factor + one dispatch per slab)
    predates the blocked join and systematically punished large slabs."""
    nq = qx_sorted.size
    best, best_cost = _SLAB_CHUNK_OPTS[-1], float("inf")
    for cq in _SLAB_CHUNK_OPTS:
        S1 = _slab1_of(cq)
        starts = np.arange(0, nq, cq)
        ends = np.minimum(starts + cq, nq)
        lo = qx_sorted[starts] - reach
        hi = qx_sorted[ends - 1] + reach
        i0 = np.searchsorted(rx_sorted, lo)
        i1 = np.searchsorted(rx_sorted, hi)
        pairs = 0.0
        windows = 0
        n_blocks = 0
        for s, e, a, b in zip(starts, ends, i0, i1):
            w = int(b - a)
            if w <= 0:
                continue
            ns = int(e - s)
            nblk = -(-ns // S1)
            qy_s = qy[s:e]
            ry_w = ry[a:b]
            r_span = float(ry_w.max() - ry_w.min())
            sub_span = (
                float(qy_s.max() - qy_s.min()) * min(S1 / ns, 1.0)
                + 2.0 * reach
            )
            frac = min(1.0, sub_span / r_span) if r_span > 0.0 else 1.0
            pairs += nblk * S1 * min(float(w), 1.15 * w * frac)
            windows += w
            n_blocks += nblk
        if n_blocks == 0:
            return cq
        cost = (
            pairs / _SLAB_PAIRS_PER_SEC
            + (pairs / _SWEEP_PAIR_BUDGET + 1.0) * _SLAB_CALL_SEC
            + _SLAB_HOST_SORT_SEC * (windows + nq)
        )
        if cost < best_cost:
            best, best_cost = cq, cost
    return best
# Band x cloud sizes up to this many pairs resolve with direct chunked
# sweeps; beyond it the reference side is compacted first on the classify
# lattice (_compact_refs_device). Crossover measured at 12.5M x 12.5M
# (2.45e12 band pairs): direct sweep 6.9 s vs compaction ~2 s + 0.9 s
# sweep on the 814k kept refs (masks identical).
_DIRECT_SWEEP_MAX = 1 << 41
# Expected band fraction of the query cloud after the packed classify at
# the production cell_div=16 lattice (measured ~1.6-3% on tiled-dragon
# 12.5M-100M clouds). Used ONLY to decide whether to dispatch the band-ref
# compaction speculatively, pipelined behind the classify before any mask
# bytes reach the host; a wrong guess costs at most one ~2 s device
# program (over-trigger) or falls back to the sequential dispatch
# (under-trigger) — never correctness.
_BAND_FRAC_EST = 0.02


def _chunked_min_d2(Xf, q_idx: np.ndarray, Xm, H0,
                    ref_idx: Optional[np.ndarray]) -> np.ndarray:
    """Run _min_d2_subset/_min_d2_full over host-side query chunks sized so
    each device program stays within _SWEEP_PAIR_BUDGET pairs. q_idx is the
    unpadded query index array; returns d2 aligned with it."""
    n_refs = ref_idx.size if ref_idx is not None else Xm.shape[0]
    q_pad = _pow2_pad(q_idx)
    chunk = q_pad.size
    while chunk > 1024 and chunk * n_refs > _SWEEP_PAIR_BUDGET:
        chunk //= 2
    ref_dev = jnp.asarray(ref_idx) if ref_idx is not None else None
    parts = []
    for s in range(0, q_pad.size, chunk):
        qc = jnp.asarray(q_pad[s:s + chunk])
        if ref_dev is not None:
            parts.append(np.asarray(_min_d2_subset(Xf, qc, Xm, H0, ref_dev)))
        else:
            parts.append(np.asarray(_min_d2_full(Xf, qc, Xm, H0)))
    return np.concatenate(parts)[: q_idx.size] if len(parts) > 1 else parts[0][: q_idx.size]


def _blocked_slab_join(Xf, Xm, H0, remaining: np.ndarray,
                       ref_idx: np.ndarray, plan: DilatePlan,
                       out: np.ndarray, r2, reach: float, _mark) -> None:
    """Resolve the band with a blocked 2-D slab join, writing into `out`.

    Structure (all planning is host-side numpy on fetched coordinates):
      1. sort queries and refs along the longest lattice axis (x);
      2. chunk queries into x-slabs (size from the 1-D cost model); each
         slab's candidate refs are a contiguous x-window of the sorted refs;
      3. within a slab, sort the window's refs AND the slab's queries along
         the second-longest axis (y) and chunk queries into y-sub-chunks;
         each sub-chunk's candidates are a contiguous y-run of the window;
      4. concatenate the per-slab y-sorted windows into ONE device array
         (`_gather_ref_rows`, a single transform+gather), so every block's
         candidates are a `dynamic_slice` — no per-block gathers;
      5. sweep all blocks with `_min_d2_sliced_blocks` (lax.map), split
         into as few programs as the pair budget allows.

    Exactness: per-axis windows only exclude refs provably farther than the
    radius from every query in the block; slices/padding only ADD real
    movable points (min can only drop toward the true min). Block and
    width shapes use {2^k, 1.5*2^k} buckets to bound distinct compiles.
    """
    ax_order = np.argsort(np.asarray(plan.dims))[::-1]
    axes = (int(ax_order[0]), int(ax_order[1]))
    qx0, qx1 = np.asarray(
        _gather_query_coords2(Xf, jnp.asarray(_pow2_pad(remaining)), axes=axes)
    )[:, : remaining.size]
    rx0, rx1 = np.asarray(
        _gather_ref_coords2(Xm, H0, jnp.asarray(_pow2_pad(ref_idx)), axes=axes)
    )[:, : ref_idx.size]

    qo = _argsort_host(qx0)
    q_sorted, qx0_s, qx1_s = remaining[qo], qx0[qo], qx1[qo]
    ro = _argsort_host(rx0)
    r_by_x, rx0_s, rx1_by_x = ref_idx[ro], rx0[ro], rx1[ro]

    S0 = _pick_slab_chunk_2d(qx0_s, qx1_s, rx0_s, rx1_by_x, reach)
    S1 = _slab1_of(S0)

    cat_parts = []          # per-slab y-sorted ref indices (movable rows)
    blocks_q = []           # per-block query indices (<= S1 each)
    blocks_start = []       # per-block start into the concatenated array
    blocks_fill = []        # per-block exact candidate count
    m_off = 0
    for s in range(0, q_sorted.size, S0):
        e = min(s + S0, q_sorted.size)
        i0, i1 = np.searchsorted(
            rx0_s, [qx0_s[s] - reach, qx0_s[e - 1] + reach]
        )
        if i1 <= i0:
            out[q_sorted[s:e]] = False
            continue
        wy = rx1_by_x[i0:i1]
        yo = _argsort_host(wy)
        cat_parts.append(r_by_x[i0:i1][yo])
        wy_s = wy[yo]
        qo1 = _argsort_host(qx1_s[s:e])
        qs_by_y = q_sorted[s:e][qo1]
        qy = qx1_s[s:e][qo1]
        for t in range(0, qs_by_y.size, S1):
            te = min(t + S1, qs_by_y.size)
            j0, j1 = np.searchsorted(
                wy_s, [qy[t] - reach, qy[te - 1] + reach]
            )
            if j1 <= j0:
                out[qs_by_y[t:te]] = False
                continue
            blocks_q.append(qs_by_y[t:te])
            blocks_start.append(m_off + j0)
            blocks_fill.append(j1 - j0)
        m_off += i1 - i0

    if not blocks_q:
        _mark("blocked slab join (all windows empty)")
        return

    fills = np.asarray(blocks_fill, np.int64)
    W_max = _bucket_size(int(fills.max()))
    M_pad = max(_bucket_size(m_off), W_max)
    cat_idx = np.zeros(M_pad, np.int32)
    cat_idx[:m_off] = np.concatenate(cat_parts)
    Rsorted = _gather_ref_rows(Xm, H0, jnp.asarray(cat_idx))
    starts_np = np.asarray(blocks_start, np.int32)

    B = len(blocks_q)
    QB = np.zeros((B, S1), np.int32)
    for b, qc in enumerate(blocks_q):
        QB[b, : qc.size] = qc

    # Split into device calls under the pair budget, ordering blocks by
    # DESCENDING candidate count so each call's slice width W_g buckets the
    # widest block IN THAT CALL rather than the global maximum — a single
    # dense region no longer pads every sparse block's sweep to its width.
    # Block counts are bucketed too (padded blocks sweep query 0 vs slice
    # 0 — real data, results discarded).
    order = np.argsort(-fills, kind="stable")
    n_pairs = 0
    pos = 0
    pending = []  # (sel, device d2) — enqueue ALL programs, then fetch:
    # groups are independent and the total result volume is ~2x the band
    # size, so later groups compute while earlier bytes stream back
    # (dispatch is async; np.asarray is the barrier).
    while pos < B:
        W_g = _bucket_size(int(fills[order[pos]]))
        group = max(1, int(_SWEEP_PAIR_BUDGET // max(S1 * W_g, 1)))
        sel = order[pos: pos + group]
        pos += sel.size
        gb = _block_bucket(sel.size)
        QBg = np.zeros((gb, S1), np.int32)
        QBg[: sel.size] = QB[sel]
        stg = np.zeros(gb, np.int32)
        stg[: sel.size] = np.minimum(starts_np[sel], np.int32(M_pad - W_g))
        pending.append((sel, _min_d2_sliced_blocks(
            Xf, jnp.asarray(QBg), jnp.asarray(stg), Rsorted, W=W_g
        )))
        n_pairs += gb * S1 * W_g
    n_calls = len(pending)
    for sel, d2_dev in pending:
        d2 = np.asarray(d2_dev)
        for k, b in enumerate(sel):
            qc = blocks_q[b]
            out[qc] = d2[k, : qc.size] <= r2
    _mark(
        f"blocked slab join ({remaining.size} queries x {ref_idx.size} refs"
        f" -> {B} blocks (S0 {S0}, S1 {S1}, W_max {W_max}), {n_pairs:.3g}"
        f" padded pairs, {n_calls} calls, axes {axes})"
    )


def overlap_mask_dilate(
    Xf,
    Xm,
    H0,
    radius: float,
    plan: DilatePlan,
    *,
    Xm_host: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Full gate: classify on device, resolve the band exactly, assemble the
    final selection mask (host bool array, == the exact `min_dist <= radius`
    predicate in the input dtype).

    Band resolution never gathers per-query candidates (the measured
    ~10 ns/element TPU gather cost makes cell-list scans explode at dense
    radii — cap can reach ~700 points/cell). The packed classify keeps the
    band small enough (~2-3% of queries at cell_div=16) that direct chunked
    VPU sweeps against the full cloud resolve it in a few device seconds.
    When band x cloud exceeds _DIRECT_SWEEP_MAX, the REFERENCE side is
    compacted first: pack the band queries' own occupancy, POSS-dilate it,
    and keep only movable points whose cell that bitmap reaches — every
    dropped point is provably farther than `radius` from every band query
    (crit_poss lower-bounds cell-to-cell point distance), so sweeping the
    retained subset is exact. (A witness-decimation cascade was tried
    first and removed: at cell_div=16 the band halfwidth ~0.11r is below
    any witness level's cell diagonal until the witness set approaches the
    full cloud, so no level could prove anything the classify had not.)

    All sweeps run the existing tiled dense kernel (ops/knn.py) — the same
    one the brute gate uses — on compacted index sets sized by host-known
    counts (power-of-two buckets keep recompiles bounded).
    """
    import logging
    import time

    log = logging.getLogger(__name__)
    t0 = time.perf_counter()

    def _mark(label):
        nonlocal t0
        t1 = time.perf_counter()
        log.debug("dilate gate: %s %.2fs", label, t1 - t0)
        t0 = t1

    n_refs = Xm.shape[0]
    # Speculative pipelining: when even a typical-fraction band would
    # exceed the direct-sweep budget, enqueue the band-ref compaction
    # directly behind the classify (it consumes the band mask on device,
    # capped at 3x the typical band fraction) so its ~2 s of device time
    # runs while the classify masks stream to the host — instead of after
    # fetch + nonzero + index re-upload.
    speculate = (
        Xf.shape[0] * _BAND_FRAC_EST * n_refs > _DIRECT_SWEEP_MAX
    )
    spec_cap = _bucket_size(int(Xf.shape[0] * _BAND_FRAC_EST * 3))
    in_mask, band_mask = classify_queries(
        Xf, Xm, H0, plan=plan, Xm_host=Xm_host, block=not speculate
    )
    if speculate:
        keep_dev = _compact_refs_device(
            Xf, band_mask, Xm, H0, plan=plan, cap=spec_cap
        )
        band_np, out, keep = _fetch_masks(band_mask, in_mask, keep_dev)
    else:
        band_np, out = _fetch_masks(band_mask, in_mask)
        keep = None
    band_idx = np.nonzero(band_np)[0].astype(np.int32)
    if keep is not None and band_idx.size > spec_cap:
        # The speculative program truncated the band (nonzero size=cap):
        # its keep mask may be missing refs — discard and redo below.
        keep = None
    _mark(
        f"classify (band {band_idx.size}/{band_np.size}"
        f"{', pipelined ref compaction' if keep is not None else ''})"
    )
    if band_idx.size == 0:
        return out

    dt = np.dtype(Xf.dtype)
    r = float(radius)
    r2 = dt.type(r) * dt.type(r)  # same arithmetic as the brute gate

    remaining = band_idx
    ref_idx = None
    if keep is None and remaining.size * n_refs > _DIRECT_SWEEP_MAX:
        # Speculation under-triggered (or its cap overflowed): compact the
        # reference side now with an exact-size cap (sequential dispatch).
        keep = _fetch_mask(
            _compact_refs_device(
                Xf, band_mask, Xm, H0, plan=plan,
                cap=_bucket_size(remaining.size),
            )
        )
    if keep is not None:
        ref_idx = np.nonzero(keep)[0].astype(np.int32)
        _mark(
            f"band-ref compaction ({ref_idx.size}/{n_refs} refs kept)"
        )
        if ref_idx.size == 0:
            # no ref can be within radius of any band query
            return out

    n_kept = ref_idx.size if ref_idx is not None else n_refs
    if ref_idx is not None and remaining.size * n_kept > _SLAB_SWEEP_MIN:
        # Blocked 2-D slab join: restrict candidates along the TWO longest
        # lattice axes and sweep every block in a handful of device
        # programs. Exact per axis: a ref with |q_ax - r_ax| > radius
        # (checked with relative slack covering f32 rounding of both
        # coordinates and of the d2 accumulation) has d2 > r2 for every
        # query in the block, so dropping it cannot change the predicate;
        # every EXTRA row a slice or padding admits is a real movable
        # point, which can only (correctly) lower the min.
        _blocked_slab_join(
            Xf, Xm, H0, remaining, ref_idx, plan, out, r2,
            r * 1.001 + 1e-12, _mark,
        )
        return out

    d2 = _chunked_min_d2(
        Xf, remaining, Xm, H0,
        _pow2_pad(ref_idx) if ref_idx is not None else None,
    )
    out[remaining] = d2 <= r2
    _mark(
        f"exact sweep ({remaining.size} queries x {n_kept} refs)"
    )
    return out
