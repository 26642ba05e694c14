"""Dilated-occupancy overlap gate: gather-free radius-existence test at scale.

The overlap gate (reference: cKDTree.query with distance_upper_bound,
/root/reference/python/simpleicp/pointcloud.py:161-171) only needs a BOOLEAN
per fixed point: does ANY movable point lie within `max_overlap_distance`?
(models/icp.py consumes nothing but `d2 <= r^2`.) Measured on the TPU, every
per-query candidate GATHER costs ~8-10 ns/element whatever its form (element,
slab, planar — scripts/probe_sort_join*.py), which caps any cell-list scan at
~1e9 gathered candidates; a 12.5M x 12.5M gate wants ~1e10. This module
answers the existence question with NO per-query candidate gathers:

  1. bin the movable cloud into cells of size ~radius/2 over a dense 3D grid
     (one scatter: measured 1.2 s for 12.5M keys);
  2. dilate the occupancy bitmap with two conservative stencils, as pure
     vectorized axis-rolls over the dense grid (no gathers; the grid carries
     an empty border so wraparound is harmless):
       IN   = cells whose every point is certainly within (r - margin) of
              some movable point:   a*sqrt(sum (|d|+1)^2) <= r - margin
       POSS = cells that could possibly have a movable point within
              (r + margin):         a*sqrt(sum max(|d|-1,0)^2) <= r + margin
  3. classify each fixed point by ONE gather into the two bitmaps:
     IN -> selected; not POSS -> rejected; the thin band between them gets
     EXACT distance checks through the cell-list engine (ops/gridhash.py) on
     that small subset only.

The margin absorbs every floating-point discrepancy between the host-side
plan, the f32 device binning, and the device distance checks, always erring
toward the band (= toward exact resolution), so the final mask equals the
exact `min_dist <= r` predicate bit for bit.

Applicability: needs a dense grid over the joint bounding box —
`plan_dilate_gate` returns None when the (bordered, padded) cell count
exceeds `max_cells`, and the caller falls back to the hash-grid or brute
engines. Real scan data (surface-like, extent up to ~10^4 x radius) fits
easily; the limit only excludes extreme volumetric extents.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DilatePlan(NamedTuple):
    """Host-computed static plan of one dilated-occupancy gate."""

    origin: Tuple[float, float, float]   # grid origin (f64, includes border)
    inv_cell: float                      # 1 / cell size (f64)
    dims: Tuple[int, int, int]           # grid dims incl. border (static)
    in_offsets: Tuple[Tuple[int, int, int], ...]    # (dx, dy, z_rad)
    poss_offsets: Tuple[Tuple[int, int, int], ...]  # (dx, dy, z_rad)
    n_cells: int


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
    """Joint bounding box of the fixed cloud and the H0-transformed movable
    cloud, on device — so gate planning never fetches full clouds."""
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    lo = jnp.minimum(jnp.min(Xf, axis=0), jnp.min(Xm0, axis=0))
    hi = jnp.maximum(jnp.max(Xf, axis=0), jnp.max(Xm0, axis=0))
    return lo, hi


def plan_dilate_gate(
    X_fix: np.ndarray,
    X_mov0: np.ndarray,
    radius: float,
    *,
    cell_div: Optional[int] = None,
    max_cells: int = 1 << 27,
    bbox: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Optional[DilatePlan]:
    """Build the static gate plan on the host (numpy f64).

    Args:
        X_fix: (nf, 3) fixed cloud (the queries).
        X_mov0: (nm, 3) movable cloud AFTER the initial transform (the
            references; compute with the same H0 the device applies).
        radius: max_overlap_distance.
        cell_div: cells per radius (cell = radius / cell_div). Finer cells
            narrow the uncertain band (fewer exact checks) but cube the
            grid and grow the stencils; None picks the largest of 8/4/2
            that fits `max_cells`.
        max_cells: dense-grid budget; None is returned beyond it (caller
            falls back to the hash-grid engine).

    Returns:
        DilatePlan, or None when the joint bounding box needs too many cells.
    """
    if bbox is not None:
        lo, hi = np.asarray(bbox[0], np.float64), np.asarray(bbox[1], np.float64)
    else:
        Xf = np.asarray(X_fix, np.float64)
        Xm = np.asarray(X_mov0, np.float64)
        if Xf.size == 0 or Xm.size == 0:
            return None
        lo = np.minimum(Xf.min(axis=0), Xm.min(axis=0))
        hi = np.maximum(Xf.max(axis=0), Xm.max(axis=0))
    if not (np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))):
        return None
    if cell_div is None:
        for div in (8, 4, 2):
            plan = plan_dilate_gate(
                None, None, radius, cell_div=div, max_cells=max_cells,
                bbox=(lo, hi),
            )
            if plan is not None:
                return plan
        return None
    cell = float(radius) / cell_div

    # Border: stencil reach + 1 so axis rolls wrap only through empty cells,
    # + 1 for the f32 binning slop at the box faces.
    a_cells = cell_div  # radius in cells
    border = int(np.ceil(a_cells)) + 3
    dims_f = np.ceil((hi - lo) / cell) + 1 + 2 * border
    if np.prod(dims_f) > max_cells:
        return None
    dims = tuple(int(d) for d in dims_f)
    origin = tuple(float(v) for v in (lo - border * cell))

    # Margin: covers f32 binning error (a point may sit outside its assigned
    # cell by ~eps32 * |p - origin|) and f32 distance-check rounding. Always
    # shrinks IN and grows POSS -> band -> exact resolution.
    extent = float(np.max(hi - lo)) + 2 * border * cell
    margin = 8.0 * np.finfo(np.float32).eps * extent + 1e-12

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

    return DilatePlan(
        origin=origin,
        inv_cell=1.0 / cell,
        dims=dims,
        in_offsets=_stencil(a_cells, crit_in),
        poss_offsets=_stencil(a_cells, crit_poss),
        n_cells=int(np.prod(dims)),
    )


def _cells_of(points, origin, inv_cell, dims):
    k = jnp.floor((points - origin) * inv_cell).astype(jnp.int32)
    # Clamp into the (bordered) grid: only f32 slop at the box faces can
    # push a key out of range, and the border cell it lands in is empty for
    # refs / harmless for queries (the margin already routed such boundary
    # geometry into the band).
    return jnp.clip(k, 0, jnp.asarray(dims, jnp.int32) - 1)


def _shift2d(grid, dx, dy):
    """Roll along the two major axes; the empty border makes wrap harmless."""
    g = grid
    if dx:
        g = jnp.roll(g, dx, axis=0)
    if dy:
        g = jnp.roll(g, dy, axis=1)
    return g


def _dilate(occ, offsets):
    """OR of `occ` shifted by every (dx, dy, dz) the stencil describes.
    dz-ranges are built incrementally (Oz[k] = occ dilated by |dz| <= k),
    then each (dx, dy, z_rad) entry contributes one 2-D shift."""
    z_max = max((z for _, _, z in offsets), default=0)
    oz = [occ]
    for k in range(1, z_max + 1):
        prev = oz[-1]
        oz.append(
            prev | jnp.roll(occ, k, axis=2) | jnp.roll(occ, -k, axis=2)
        )
    out = jnp.zeros_like(occ)
    for dx, dy, z in offsets:
        out = out | _shift2d(oz[z], dx, dy)
    return out


@functools.partial(jax.jit, static_argnames=("plan",))
def classify_queries(Xf, Xm, H0, *, plan: DilatePlan):
    """Device: occupancy scatter + two dilations + one gather per query.

    Returns (in_mask, band_mask): selected-for-sure / needs exact check.
    """
    dtype = Xf.dtype
    origin = jnp.asarray(plan.origin, dtype)
    inv_cell = jnp.asarray(plan.inv_cell, dtype)
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]

    dims = plan.dims
    kr = _cells_of(Xm0, origin, inv_cell, dims)
    flat = (kr[:, 0] * dims[1] + kr[:, 1]) * dims[2] + kr[:, 2]
    occ = (
        jnp.zeros(plan.n_cells, jnp.uint8)
        .at[flat]
        .max(jnp.uint8(1), mode="drop")
        .reshape(dims)
        .astype(bool)
    )

    in_grid = _dilate(occ, plan.in_offsets)
    poss_grid = _dilate(occ, plan.poss_offsets)

    kq = _cells_of(Xf, origin, inv_cell, dims)
    in_mask = in_grid[kq[:, 0], kq[:, 1], kq[:, 2]]
    poss_mask = poss_grid[kq[:, 0], kq[:, 1], kq[:, 2]]
    return in_mask, poss_mask & ~in_mask


@functools.partial(jax.jit, static_argnames=("inv_cell",))
def _fine_cells_i16(Xm, H0, origin, *, inv_cell: float):
    """Finest-level cell triples of the transformed movable cloud, as int16
    (the caller guarantees < 32768 cells per dim at this level)."""
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    k = jnp.floor((Xm0 - origin) * jnp.asarray(inv_cell, Xm.dtype))
    return jnp.clip(k, 0, 32766).astype(jnp.int16)


@jax.jit
def _min_d2_subset(Xf, q_idx, Xm, H0, ref_idx):
    """Min squared distance from the indexed queries to the indexed
    (transformed) movable points — the dense VPU sweep on compacted sets."""
    from .knn import min_dist_sq

    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    Q = Xf[jnp.clip(q_idx, 0, Xf.shape[0] - 1)]
    R = Xm0[jnp.clip(ref_idx, 0, Xm.shape[0] - 1)]
    return min_dist_sq(Q, R, ref_tile=65536)


@jax.jit
def _min_d2_full(Xf, q_idx, Xm, H0):
    from .knn import min_dist_sq

    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    Q = Xf[jnp.clip(q_idx, 0, Xf.shape[0] - 1)]
    return min_dist_sq(Q, Xm0, ref_tile=65536)


def _pow2_pad(idx: np.ndarray) -> np.ndarray:
    n_pad = 1 << max(int(np.ceil(np.log2(max(idx.size, 1)))), 10)
    out = np.zeros(n_pad, np.int32)
    out[: idx.size] = idx
    return out


# Pair budget per device call: ~4e12 exact-distance pairs is a few seconds
# of VPU time. Splitting the sweep host-side bounds every device program's
# runtime (the TPU runtime watchdog kills multi-minute programs — round 1
# lost the hash-grid gate to exactly that) at the cost of one ~32 ms tunnel
# roundtrip per extra chunk.
_SWEEP_PAIR_BUDGET = 1 << 42


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


def overlap_mask_dilate(
    Xf,
    Xm,
    H0,
    radius: float,
    plan: DilatePlan,
) -> np.ndarray:
    """Full gate: classify on device, resolve the band exactly via a
    decimation cascade, assemble the final selection mask (host bool array,
    == the exact f32 `min_dist <= radius` predicate).

    Band resolution never gathers per-query candidates (the measured
    ~10 ns/element TPU gather cost makes cell-list scans explode at dense
    radii — cap can reach ~700 points/cell). Instead it brute-sweeps the
    band against DECIMATED witness clouds (one actual movable point per
    fine cell, host-picked via np.unique on device-computed keys):

      * a witness within `radius` PROVES selection (it is a real point —
        no slop, no margin);
      * every witness beyond `radius + cell_diag + margin` proves
        rejection (any point is within cell_diag of its cell's witness);
      * the leftover sliver (min-witness-distance straddling the radius)
        halves per level and ends with one exact sweep against the full
        cloud.

    All stages run the existing tiled dense kernel (ops/knn.py) — the same
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

    in_mask, band_mask = classify_queries(Xf, Xm, H0, plan=plan)
    band_np = np.asarray(band_mask)
    out = np.asarray(in_mask).copy()
    band_idx = np.nonzero(band_np)[0].astype(np.int32)
    _mark(f"classify (band {band_idx.size}/{band_np.size})")
    if band_idx.size == 0:
        return out

    dt = np.dtype(Xf.dtype)
    r = float(radius)
    r2 = dt.type(r) * dt.type(r)  # same arithmetic as the brute gate
    cell0 = 1.0 / plan.inv_cell
    # absolute slop of the device distance computation at this scale
    extent = cell0 * max(plan.dims)
    slop = 8.0 * float(np.finfo(dt).eps) * extent * max(r, 1.0)

    # Witness levels, coarse -> fine; cells = radius / div, constrained so
    # the finest level's dims stay within int16 packing range. One host
    # argsort of the finest-level packed keys serves every level: sorted by
    # fine key is sorted by every coarser prefix, so each level's
    # one-witness-per-cell list is just the run starts of its shifted keys.
    divs = sorted(d for d in (8, 32) if (max(plan.dims) * cell0 * d / r) < 32000)
    if divs:
        fine_div = divs[-1]
        k64 = np.asarray(
            _fine_cells_i16(
                Xm, H0,
                jnp.asarray(plan.origin, Xf.dtype),
                inv_cell=1.0 / (r / fine_div),
            )
        ).astype(np.int64)
        packed_fine = (k64[:, 0] << 32) | (k64[:, 1] << 16) | k64[:, 2]
        order = np.argsort(packed_fine).astype(np.int32)
        k_sorted = k64[order]
        _mark("witness key fetch + sort")

    remaining = band_idx
    for div in divs:
        shift = int(np.log2(fine_div // div))
        kd = k_sorted >> shift
        packed = (kd[:, 0] << 32) | (kd[:, 1] << 16) | kd[:, 2]
        starts = np.empty(packed.size, bool)
        starts[0] = True
        np.not_equal(packed[1:], packed[:-1], out=starts[1:])
        rep_idx = _pow2_pad(order[starts])
        d2 = _chunked_min_d2(Xf, remaining, Xm, H0, rep_idx)
        diag = np.sqrt(3.0) * (r / div)
        thresh_out = (r + diag + slop) ** 2
        proven_in = d2 <= r2
        proven_out = d2 > thresh_out
        out[remaining[proven_in]] = True
        remaining = remaining[~proven_in & ~proven_out]
        _mark(
            f"witness div={div} ({int(np.sum(starts))} reps, "
            f"{remaining.size} left)"
        )
        if remaining.size == 0:
            return out

    d2 = _chunked_min_d2(Xf, remaining, Xm, H0, None)
    out[remaining] = d2 <= r2
    _mark(f"exact sweep ({remaining.size} queries x full cloud)")
    return out
