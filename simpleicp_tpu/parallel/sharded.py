"""Sharded ICP: the full registration pipeline running SPMD over a device mesh.

Both clouds are sharded over the 1-D `points` mesh axis (equal per-device
blocks, validity-mask padded); everything per-correspondence (C ~ 1000 slots)
is replicated. The heavy kernels run on local shards and combine with
collectives:

  * overlap gate — a ring pass: each device holds its fixed-cloud block as
    queries and streams the movable-cloud blocks around the ring with
    `ppermute`, keeping a running min distance (the "ring-attention-shaped
    dataflow, but for distance minima" of SURVEY.md §5);
  * fixed-count selection — a distributed exclusive-scan of the selection
    mask gives each selected point its global rank; the round(linspace) pick
    becomes a per-point membership test, and the winners are scattered into
    replicated (C, .) buffers with a `psum`;
  * normal-estimation kNN — local top-k per shard, `all_gather` of the
    (C, k) candidate sets, merge top-k;
  * per-iteration NN matching — local argmin per shard + `all_gather` of the
    (C,) winners, global argmin; the matched rows are fetched from the owning
    shard by a masked-scatter `psum` gather;
  * the solver, statistics, and convergence logic are replicated C-sized math
    (reusing models.icp.run_icp_loop verbatim — the shared loop takes the
    matching strategy as a function).

The reference has no distributed implementation of any kind; this module is
new design (BASELINE.json north star: fixed cloud sharded per host, psum'd
normal equations, on-device convergence).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import IcpConfig
from ..models.icp import (
    ERR_NO_OVERLAP,
    ERR_OK,
    IcpResult,
    _result_from_carry,
    run_icp_loop,
)
from ..ops.knn import knn_search, nn_search
from ..ops.normals import estimate_normals_from_neighborhoods
from ..ops.transform import apply_H, rbp_to_H
from .mesh import POINTS_AXIS, make_mesh


def _pad_to(X: np.ndarray, n_total: int, fill=0.0):
    n = X.shape[0]
    if n == n_total:
        return X
    pad = np.full((n_total - n,) + X.shape[1:], fill, dtype=X.dtype)
    return np.concatenate([X, pad], axis=0)


def _put_sharded(arr: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Place a host array onto the mesh.

    Single-process: plain `device_put`. Multi-process (multi-host pod): every
    process holds the same full host array; slice out this process's rows
    and assemble the global array with
    `jax.make_array_from_process_local_data`, so each host only transfers
    its own shard to its own devices (the SURVEY §5 host-local loading
    path). Replicated (rank-0-spec) arrays always go through `device_put`.
    """
    if jax.process_count() == 1 or not sharding.spec or sharding.spec[0] is None:
        return jax.device_put(arr, sharding)
    # Contiguous row block owned by this process: mesh devices are laid out
    # process-major (jax.devices() order), and the sharded axis is axis 0.
    mesh_devs = list(sharding.mesh.devices.flat)
    ndev = len(mesh_devs)
    rows_per_dev = arr.shape[0] // ndev
    mine = [i for i, d in enumerate(mesh_devs)
            if d.process_index == jax.process_index()]
    lo, hi = mine[0] * rows_per_dev, (mine[-1] + 1) * rows_per_dev
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(arr[lo:hi]), arr.shape
    )


# --------------------------------------------------------------------------
# collective building blocks (run inside shard_map; `axis` is the mesh axis)
# --------------------------------------------------------------------------

def _combine_nn(d2_local, gidx_local, axis):
    """Combine per-shard NN winners into the global winner (replicated).

    Ties resolve to the lowest device index = lowest global row index
    (shards are contiguous blocks), matching the serial kernel.
    """
    all_d2 = lax.all_gather(d2_local, axis)      # (ndev, C)
    all_idx = lax.all_gather(gidx_local, axis)   # (ndev, C)
    win = jnp.argmin(all_d2, axis=0)
    d2 = jnp.take_along_axis(all_d2, win[None], 0)[0]
    idx = jnp.take_along_axis(all_idx, win[None], 0)[0]
    return d2, idx


def _gather_rows(local_block, gidx, axis):
    """Fetch rows of a ('points',)-sharded array by global index into a
    replicated buffer: each device contributes the rows it owns via a masked
    scatter, then one psum. gidx: (n,) int32; local_block: (rows, d)."""
    rows = local_block.shape[0]
    me = lax.axis_index(axis)
    owner = gidx // rows
    local_row = gidx % rows
    mine = owner == me
    contrib = jnp.where(
        mine[:, None], local_block[jnp.where(mine, local_row, 0)], 0.0
    )
    return lax.psum(contrib, axis)


def _ring_min_dist2(Qf_local, f_valid, Xm_local, m_valid, axis, ndev,
                    ref_tile, query_tile):
    """Min squared distance from each local fixed point to ANY movable point,
    streaming movable blocks around the ring (ppermute) — the overlap gate.
    """
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def step(s, carry):
        best, block, bmask = carry
        d2, _ = nn_search(
            Qf_local, block, ref_tile=ref_tile, query_tile=query_tile,
            ref_mask=bmask,
        )
        best = jnp.minimum(best, d2)
        block = lax.ppermute(block, axis, perm)
        bmask = lax.ppermute(bmask, axis, perm)
        return best, block, bmask

    best0 = jnp.full((Qf_local.shape[0],), jnp.inf, Qf_local.dtype)
    best, _, _ = lax.fori_loop(0, ndev, step, (best0, Xm_local, m_valid))
    return jnp.where(f_valid, best, jnp.inf)


def _ring_min_dist2_grid(Qf_local, f_valid, Xm_local, m_valid, radius,
                         cell_cap, axis, ndev):
    """Spatial-hash variant of the ring gate for 50M+-point shards: each
    device sorts its movable block into a cell list ONCE, then the sorted
    structure (points, slots, origin) travels the ring, so every ring step
    is an O(27*cell_cap)-per-query lookup instead of an O(rows) sweep.
    All shards bin on ONE global lattice (origin = pmin of the per-shard
    valid minima), so each shard's slot occupancy is bounded by the
    full-cloud occupancy and a full-cloud `grid_cell_cap` is a provably
    valid `cell_cap` — per-shard local origins would shift the lattice and
    break that bound (a shard cell could straddle up to 8 full-cloud
    cells), silently truncating candidates."""
    from ..ops.gridhash import build_sorted_grid, grid_query_sorted

    perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    big = jnp.asarray(1e30, Xm_local.dtype)
    local_min = jnp.min(jnp.where(m_valid[:, None], Xm_local, big), axis=0)
    origin = lax.pmin(local_min, axis)
    sorted_pts, sorted_slots, _, _, run_end = build_sorted_grid(
        Xm_local, radius, valid=m_valid, origin=origin
    )

    def step(s, carry):
        best, pts, slots, rend = carry
        d2, _ = grid_query_sorted(
            Qf_local, pts, slots, origin, radius, cell_cap=cell_cap,
            run_end=rend,
        )
        best = jnp.minimum(best, d2)
        pts = lax.ppermute(pts, axis, perm)
        slots = lax.ppermute(slots, axis, perm)
        rend = lax.ppermute(rend, axis, perm)
        return best, pts, slots, rend

    best0 = jnp.full((Qf_local.shape[0],), jnp.inf, Qf_local.dtype)
    best, _, _, _ = lax.fori_loop(
        0, ndev, step, (best0, sorted_pts, sorted_slots, run_end)
    )
    return jnp.where(f_valid, best, jnp.inf)


def _allgather_min_dist2(Qf_local, f_valid, Xm_local, m_valid, axis,
                         ref_tile, query_tile):
    """All-gather variant of the dense overlap gate: materialize the full
    movable cloud on every device with ONE collective, then a single local
    sweep. Same result as _ring_min_dist2 bit-for-bit (the tiled sweep over
    the concatenated blocks visits the same points in the same order).

    Trade-off vs the ring: one big all_gather up front (full movable cloud
    per device — memory-bound at very large clouds) instead of ndev
    ppermute hops interleaved with compute; which wins depends on the
    ICI bandwidth/latency point, so both stay behind `gate_collective` for
    the first real multi-chip A/B (scripts/bench_multichip.py sweeps it).
    """
    blocks = lax.all_gather(Xm_local, axis)  # (ndev, rows, 3)
    masks = lax.all_gather(m_valid, axis)
    Xm_full = blocks.reshape(-1, 3)
    m_full = masks.reshape(-1)
    d2, _ = nn_search(
        Qf_local, Xm_full, ref_tile=ref_tile, query_tile=query_tile,
        ref_mask=m_full,
    )
    return jnp.where(f_valid, d2, jnp.inf)


def _allgather_min_dist2_grid(Qf_local, f_valid, Xm_local, m_valid, radius,
                              cell_cap, axis, ndev):
    """All-gather variant of the sorted-cell-list gate: each device builds
    its local cell list on the GLOBAL lattice (same as the ring variant),
    then the structures are all-gathered once and queried in a local
    fori_loop — identical per-shard lookups to _ring_min_dist2_grid, with
    all communication paid up front instead of per hop."""
    from ..ops.gridhash import build_sorted_grid, grid_query_sorted

    big = jnp.asarray(1e30, Xm_local.dtype)
    local_min = jnp.min(jnp.where(m_valid[:, None], Xm_local, big), axis=0)
    origin = lax.pmin(local_min, axis)
    sorted_pts, sorted_slots, _, _, run_end = build_sorted_grid(
        Xm_local, radius, valid=m_valid, origin=origin
    )
    all_pts = lax.all_gather(sorted_pts, axis)      # (ndev, rows, 3)
    all_slots = lax.all_gather(sorted_slots, axis)  # (ndev, rows)
    all_rend = lax.all_gather(run_end, axis)

    def step(s, best):
        d2, _ = grid_query_sorted(
            Qf_local, all_pts[s], all_slots[s], origin, radius,
            cell_cap=cell_cap, run_end=all_rend[s],
        )
        return jnp.minimum(best, d2)

    best0 = jnp.full((Qf_local.shape[0],), jnp.inf, Qf_local.dtype)
    best = lax.fori_loop(0, ndev, step, best0)
    return jnp.where(f_valid, best, jnp.inf)


def _sharded_select_n(sel_local, Xf_local, C, axis, ndev, dtype):
    """Distributed fixed-count equidistant selection.

    Every slot j's target is the GLOBAL selection rank
    rho_j = round(linspace(0, n_sel-1, C))[j], computed replicated with the
    same exact int32 construction as the single-chip engine
    (models.icp.round_linspace — bit-equal to numpy's float64 linspace, no
    f32 rounding at any n_sel). Each device owns ranks
    [offset, offset+count_local); it compacts its local selected rows once
    and serves the slots whose target rank it owns; one psum assembles the
    replicated (C, .) winners. Exactly reproduces
    /root/reference/python/simpleicp/pointcloud.py:141-147 under sharding.

    Returns (Q (C,3) replicated, sel_gidx (C,), valid (C,), n_sel).
    """
    from ..models.icp import round_linspace

    rows = sel_local.shape[0]
    me = lax.axis_index(axis)
    counts = lax.all_gather(jnp.sum(sel_local), axis)  # (ndev,)
    offset = jnp.sum(jnp.where(jnp.arange(ndev) < me, counts, 0))
    count_local = jnp.sum(sel_local)
    n_sel = jnp.sum(counts)

    need_sub = n_sel > C
    j = jnp.arange(C, dtype=jnp.int32)
    lin = round_linspace(n_sel, C) if C > 1 else jnp.zeros((C,), jnp.int32)
    rho = jnp.where(need_sub, lin, j)  # target global rank per slot
    valid = jnp.where(need_sub, jnp.ones(C, bool), j < n_sel)

    # local row of the k-th locally-selected point
    compacted = jnp.nonzero(sel_local, size=rows, fill_value=0)[0]
    lk = rho - offset.astype(jnp.int32)  # local rank of each slot's target
    mine = (lk >= 0) & (lk < count_local) & valid
    row = compacted[jnp.clip(lk, 0, rows - 1)]
    Q = jnp.where(mine[:, None], Xf_local[row], 0.0)
    sel_gidx = jnp.where(mine, (me * rows + row).astype(jnp.int32), 0)
    Q = lax.psum(Q, axis)
    sel_gidx = lax.psum(sel_gidx, axis)
    return Q, sel_gidx, valid, n_sel


def _sharded_knn(Q, Xf_local, f_valid, k, axis, ndev, ref_tile, query_tile):
    """k-NN of replicated queries against the sharded fixed cloud: local
    top-k per shard, all_gather, merge. Returns global (C, k) indices."""
    rows = Xf_local.shape[0]
    me = lax.axis_index(axis)
    d2_l, idx_l = knn_search(
        Q, Xf_local, k, ref_tile=ref_tile, query_tile=query_tile,
        ref_mask=f_valid,
    )
    gidx_l = idx_l + me * rows
    all_d2 = lax.all_gather(d2_l, axis)    # (ndev, C, k)
    all_idx = lax.all_gather(gidx_l, axis)
    C = Q.shape[0]
    cand_d = jnp.moveaxis(all_d2, 0, 1).reshape(C, ndev * k)
    cand_i = jnp.moveaxis(all_idx, 0, 1).reshape(C, ndev * k)
    neg_top, pos = lax.top_k(-cand_d, k)
    idx = jnp.take_along_axis(cand_i, pos, axis=1)
    return -neg_top, idx


# --------------------------------------------------------------------------
# the sharded pipeline (spmd bodies shared by monolithic + chunked dispatch)
# --------------------------------------------------------------------------

def _spmd_prologue_body(cfg: IcpConfig, axis, ndev, has_normals, qt, rt,
                        Xf_l, fv_l, Xm_l, mv_l, ext_l, obs_vals,
                        nrm_l, pla_l):
    """Pipeline stages 1-4 inside shard_map: initial H, overlap gate (ring /
    all-gather / precomputed dilate mask), distributed fixed-count selection,
    normals. Shared verbatim by the monolithic spmd and the chunked prologue
    program, so the two dispatch shapes are bit-identical by construction
    (the single-chip analog is models.icp._prologue_stages).

    Returns (Q, normals, planarity, sel_gidx, sel_valid, error, H0), all
    replicated."""
    dtype = Xf_l.dtype
    C = cfg.correspondences

    H0 = rbp_to_H(obs_vals)
    error = jnp.int32(ERR_OK)

    # ---- overlap gate (ring pass over movable shards, or the
    # precomputed dilated-occupancy mask sharded in) ----
    if cfg.overlap_enabled:
        if cfg.gate_method == "dilate":
            sel_l = fv_l & ext_l
        else:
            Xm0_l = apply_H(Xm_l, H0)
            ring = cfg.gate_collective == "ring"
            if cfg.gate_method == "grid":
                gate = (_ring_min_dist2_grid if ring
                        else _allgather_min_dist2_grid)
                d2 = gate(
                    Xf_l, fv_l, Xm0_l, mv_l, cfg.max_overlap_distance,
                    max(cfg.grid_cell_cap, 1), axis, ndev,
                )
            elif ring:
                d2 = _ring_min_dist2(
                    Xf_l, fv_l, Xm0_l, mv_l, axis, ndev, rt, qt
                )
            else:
                d2 = _allgather_min_dist2(
                    Xf_l, fv_l, Xm0_l, mv_l, axis, rt, qt
                )
            sel_l = fv_l & (
                d2 <= jnp.asarray(cfg.max_overlap_distance, dtype) ** 2
            )
        any_sel = lax.psum(jnp.sum(sel_l), axis) > 0
        error = jnp.where(any_sel, error, jnp.int32(ERR_NO_OVERLAP))
        sel_l = jnp.where(any_sel, sel_l, fv_l)
    else:
        sel_l = fv_l

    # ---- distributed fixed-count selection ----
    Q, sel_gidx, sel_valid, _ = _sharded_select_n(
        sel_l, Xf_l, C, axis, ndev, dtype
    )

    # ---- normals ----
    if has_normals:
        normals = _gather_rows(nrm_l, sel_gidx, axis)
        planarity = _gather_rows(pla_l[:, None], sel_gidx, axis)[:, 0]
    else:
        _, idxk = _sharded_knn(Q, Xf_l, fv_l, cfg.neighbors, axis, ndev, rt, qt)
        flat = idxk.reshape(-1)
        neigh = _gather_rows(Xf_l, flat, axis).reshape(C, cfg.neighbors, 3)
        normals, planarity, _ = estimate_normals_from_neighborhoods(neigh)
    return Q, normals, planarity, sel_gidx, sel_valid, error, H0


def _spmd_build_match_grid(cfg: IcpConfig, axis, Xm_l, mv_l):
    """The sharded static-grid matcher's one-time cell list: each shard
    builds over its original movable block, binned on a GLOBAL lattice
    origin (pmin of per-shard valid minima) so the full-cloud cell cap
    bounds per-shard slot occupancy. Rigid motion preserves distances, so
    this single build serves every iteration (models.icp._build_match_grid
    rationale). Returns (g_pts, g_slots, g_order, g_origin, g_run_end) —
    per-shard arrays except the replicated origin."""
    from ..ops.gridhash import build_sorted_grid

    dtype = Xm_l.dtype
    rm = jnp.asarray(
        cfg.match_radius if cfg.match_radius > 0
        else cfg.max_overlap_distance, dtype,
    )
    big = jnp.asarray(1e30, dtype)
    g_origin = lax.pmin(
        jnp.min(jnp.where(mv_l[:, None], Xm_l, big), axis=0), axis
    )
    g_pts, g_slots, g_order, _, g_run_end = build_sorted_grid(
        Xm_l, rm, valid=mv_l, origin=g_origin
    )
    return g_pts, g_slots, g_order, g_origin, g_run_end


def _spmd_match_fns(cfg: IcpConfig, axis, Q, Xm_l, mv_l, grid, qt, rt):
    """The per-iteration collective matcher + row gather for the shared ICP
    loop. `grid` is the _spmd_build_match_grid 5-tuple for
    match_method='grid' (passed explicitly so the chunked dispatcher can
    build it once in the prologue program and feed it to every chunk).

    Grid matcher: queries are replicated, so each shard queries its local
    cell list with the back-transformed queries and the per-shard winners
    min-combine — no ring pass. Brute: local argmin per shard + combine."""
    dtype = Q.dtype
    mrows = Xm_l.shape[0]
    me = lax.axis_index(axis)

    if cfg.match_method == "grid":
        from ..ops.gridhash import grid_query_sorted

        rm = jnp.asarray(
            cfg.match_radius if cfg.match_radius > 0
            else cfg.max_overlap_distance, dtype,
        )
        g_pts, g_slots, g_order, g_origin, g_run_end = grid

        def match_fn(Ht):
            R, t = Ht[:3, :3], Ht[:3, 3]
            qb = (Q - t) @ R  # rigid inverse: NN(q, Ht x) == NN(qb, x)
            d2_l, pos_l = grid_query_sorted(
                qb, g_pts, g_slots, g_origin, rm,
                cell_cap=max(cfg.match_cell_cap, 1), run_end=g_run_end,
            )
            d2, m_idx = _combine_nn(
                d2_l, g_order[pos_l].astype(jnp.int32) + me * mrows, axis
            )
            m_ok = d2 <= rm * rm
            m_idx = jnp.where(m_ok, m_idx, 0)
            m_orig = _gather_rows(Xm_l, m_idx, axis)
            return m_idx, apply_H(m_orig, Ht), m_orig, m_ok
    else:
        def match_fn(Ht):
            Xm_t_l = apply_H(Xm_l, Ht)
            d2_l, idx_l = nn_search(
                Q, Xm_t_l, ref_tile=rt, query_tile=qt, ref_mask=mv_l
            )
            _, m_idx = _combine_nn(d2_l, idx_l + me * mrows, axis)
            m_t = _gather_rows(Xm_t_l, m_idx, axis)
            m_orig = _gather_rows(Xm_l, m_idx, axis)
            return m_idx, m_t, m_orig, jnp.ones_like(m_idx, bool)

    def gather_fn(m_idx):
        return _gather_rows(Xm_l, m_idx, axis)

    return match_fn, gather_fn


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "has_normals", "has_mov_planarity", "mesh", "ndev"),
)
def _icp_run_sharded(Xf, f_valid, Xm, m_valid, ext_sel, obs_vals, obs_w,
                     normals_fix, planarity_fix, planarity_mov,
                     *, cfg: IcpConfig, has_normals: bool,
                     has_mov_planarity: bool,
                     mesh: jax.sharding.Mesh, ndev: int,
                     prep=None) -> IcpResult:
    axis = mesh.axis_names[0]
    qt, rt = cfg.query_tile, (cfg.ref_tile or 4096)
    has_prep = prep is not None

    def spmd(Xf_l, fv_l, Xm_l, mv_l, ext_l, obs_vals, obs_w, nrm_l, pla_l,
             pmov_l, *prep_arrs):
        dtype = Xf_l.dtype

        if has_prep:
            # Prepared fixed side (models.icp.prepare_fixed), replicated in:
            # the ungated selection + normals are mesh-independent (padding
            # sits at the cloud tail, so the sharded global indices equal
            # the original indices the preparation carries).
            Q, normals, planarity, sel_gidx, sel_valid = prep_arrs
            H0 = rbp_to_H(obs_vals)
            error = jnp.int32(ERR_OK)
        else:
            Q, normals, planarity, sel_gidx, sel_valid, error, H0 = (
                _spmd_prologue_body(
                    cfg, axis, ndev, has_normals, qt, rt,
                    Xf_l, fv_l, Xm_l, mv_l, ext_l, obs_vals, nrm_l, pla_l,
                )
            )

        # ---- the shared ICP loop with a collective matcher ----
        grid = (_spmd_build_match_grid(cfg, axis, Xm_l, mv_l)
                if cfg.match_method == "grid" else None)
        match_fn, gather_fn = _spmd_match_fns(
            cfg, axis, Q, Xm_l, mv_l, grid, qt, rt
        )

        mov_planarity_fn = (
            (lambda m_idx: _gather_rows(pmov_l[:, None], m_idx, axis)[:, 0])
            if has_mov_planarity else None
        )

        final, uncertainties, covariance = run_icp_loop(
            Q, normals, planarity, sel_valid, obs_vals, obs_w, cfg, dtype,
            error, H0, match_fn, gather_fn,
            mov_planarity_fn=mov_planarity_fn,
        )

        return _result_from_carry(
            final, uncertainties, covariance, sel_gidx, sel_valid, normals,
            planarity,
        )

    sharded = P(axis)
    sharded2d = P(axis, None)
    rep = P()
    out_specs = IcpResult(
        H=rep, p=rep, uncertainties=rep, covariance=rep, n_iterations=rep,
        converged=rep,
        error_code=rep, iter_counts=rep, iter_means=rep, iter_stds=rep,
        orig_count=rep, orig_mean=rep, orig_std=rep, residuals=rep,
        residual_mask=rep, distance_weight=rep, sel_idx=rep, sel_valid=rep,
        normals=rep, planarity=rep, iter_ps=rep, iter_midx=rep,
        iter_masks=rep, iter_dists=rep, iter_gn_rel_steps=rep,
    )
    return shard_map(
        spmd,
        mesh=mesh,
        in_specs=(sharded2d, sharded, sharded2d, sharded, sharded, rep, rep,
                  sharded2d, sharded, sharded)
        + ((rep,) * 5 if has_prep else ()),
        out_specs=out_specs,
        check_vma=False,
    )(Xf, f_valid, Xm, m_valid, ext_sel, obs_vals, obs_w, normals_fix,
      planarity_fix, planarity_mov, *(prep if has_prep else ()))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "has_normals", "mesh", "ndev", "build_grid"),
)
def _icp_prologue_sharded(Xf, f_valid, Xm, m_valid, ext_sel, obs_vals,
                          normals_fix, planarity_fix,
                          *, cfg: IcpConfig, has_normals: bool,
                          mesh: jax.sharding.Mesh, ndev: int,
                          build_grid: bool):
    """Sharded chunked-dispatch program 1 (mirrors models.icp._icp_prologue_jit):
    stages 1-4 plus the optional one-time grid build, as ONE shard_map
    program. The per-shard grid arrays come back sharded and stay
    device-resident for every chunk."""
    axis = mesh.axis_names[0]
    qt, rt = cfg.query_tile, (cfg.ref_tile or 4096)

    def spmd(Xf_l, fv_l, Xm_l, mv_l, ext_l, obs_vals, nrm_l, pla_l):
        out = _spmd_prologue_body(
            cfg, axis, ndev, has_normals, qt, rt,
            Xf_l, fv_l, Xm_l, mv_l, ext_l, obs_vals, nrm_l, pla_l,
        )
        grid = (_spmd_build_match_grid(cfg, axis, Xm_l, mv_l)
                if build_grid else ())
        return out + (grid,)

    sharded, sharded2d, rep = P(axis), P(axis, None), P()
    grid_specs = ((sharded2d, sharded, sharded, rep, sharded)
                  if build_grid else ())
    return shard_map(
        spmd,
        mesh=mesh,
        in_specs=(sharded2d, sharded, sharded2d, sharded, sharded, rep,
                  sharded2d, sharded),
        out_specs=(rep, rep, rep, rep, rep, rep, rep, grid_specs),
        check_vma=False,
    )(Xf, f_valid, Xm, m_valid, ext_sel, obs_vals, normals_fix,
      planarity_fix)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "ndev", "build_grid"),
)
def _prep_prologue_sharded(Xm, m_valid, obs_vals, *, cfg: IcpConfig,
                           mesh: jax.sharding.Mesh, ndev: int,
                           build_grid: bool):
    """Sharded chunked-dispatch prologue when the fixed side is PREPARED
    (models.icp.prepare_fixed): only the initial transform and the grid
    matcher's one-time per-shard cell lists remain — the
    models.icp._prep_chunk_prologue_jit analog over a device mesh."""
    axis = mesh.axis_names[0]

    def spmd(Xm_l, mv_l, obs_vals):
        H0 = rbp_to_H(obs_vals)
        grid = (_spmd_build_match_grid(cfg, axis, Xm_l, mv_l)
                if build_grid else ())
        return H0, jnp.int32(ERR_OK), grid

    sharded, sharded2d, rep = P(axis), P(axis, None), P()
    grid_specs = ((sharded2d, sharded, sharded, rep, sharded)
                  if build_grid else ())
    return shard_map(
        spmd,
        mesh=mesh,
        in_specs=(sharded2d, sharded, rep),
        out_specs=(rep, rep, grid_specs),
        check_vma=False,
    )(Xm, m_valid, obs_vals)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "has_mov_planarity", "use_grid", "mesh", "ndev"),
)
def _icp_chunk_sharded(carry, it_hi, Q, normals, planarity, sel_valid,
                       obs_vals, obs_w, Xm, m_valid, planarity_mov, grid,
                       *, cfg: IcpConfig, has_mov_planarity: bool,
                       use_grid: bool, mesh: jax.sharding.Mesh, ndev: int):
    """Sharded chunked-dispatch program 2 (compiled ONCE, re-dispatched per
    chunk — mirrors models.icp._icp_chunk_jit): resume the collective ICP
    while_loop from the replicated `carry`, stop at iteration `it_hi`
    (traced), return the carry plus the uncertainty estimate of its final
    state."""
    axis = mesh.axis_names[0]
    qt, rt = cfg.query_tile, (cfg.ref_tile or 4096)

    def spmd(carry, it_hi, Q, normals, planarity, sel_valid, obs_vals,
             obs_w, Xm_l, mv_l, pmov_l, grid):
        dtype = Q.dtype
        match_fn, gather_fn = _spmd_match_fns(
            cfg, axis, Q, Xm_l, mv_l, grid if use_grid else None, qt, rt
        )
        mov_planarity_fn = (
            (lambda m_idx: _gather_rows(pmov_l[:, None], m_idx, axis)[:, 0])
            if has_mov_planarity else None
        )
        return run_icp_loop(
            Q, normals, planarity, sel_valid, obs_vals, obs_w, cfg, dtype,
            jnp.int32(ERR_OK), jnp.eye(4, dtype=dtype),  # unused: carry_in
            match_fn, gather_fn, mov_planarity_fn=mov_planarity_fn,
            carry_in=carry, it_hi=it_hi,
        )

    sharded, sharded2d, rep = P(axis), P(axis, None), P()
    carry_specs = jax.tree.map(lambda _: rep, carry)
    grid_specs = ((sharded2d, sharded, sharded, rep, sharded)
                  if use_grid else ())
    return shard_map(
        spmd,
        mesh=mesh,
        in_specs=(carry_specs, rep, rep, rep, rep, rep, rep, rep,
                  sharded2d, sharded, sharded, grid_specs),
        out_specs=(carry_specs, rep, rep),
        check_vma=False,
    )(carry, it_hi, Q, normals, planarity, sel_valid, obs_vals, obs_w,
      Xm, m_valid, planarity_mov, grid)


def _icp_run_sharded_chunked(Xf, f_valid, Xm, m_valid, ext_sel, obs_vals,
                             obs_w, normals_fix, planarity_fix,
                             planarity_mov,
                             *, cfg: IcpConfig, has_normals: bool,
                             has_mov_planarity: bool,
                             mesh: jax.sharding.Mesh, ndev: int,
                             chunk_iters: int, prep=None) -> IcpResult:
    """Host-chunked SHARDED registration (the models.icp._icp_run_chunked
    analog over a device mesh): one prologue shard_map program, then
    K-iteration loop programs re-dispatched from the host with the
    replicated carry, the sharded clouds, and the per-shard grid staying
    device-resident between chunks.

    Per-device work already shrinks with the mesh, so most sharded configs
    run monolithic; this path exists for big-correspondence jobs on small
    meshes (per-chunk device time stays bounded under the same watchdog
    guard as single-chip). Bit-identical to the monolithic sharded program:
    the spmd stage bodies are shared functions, and the chunk boundary only
    moves where the while_loop condition is evaluated (pinned by
    tests/test_sharded.py::test_sharded_chunked_*)."""
    from ..models.icp import make_carry_init

    use_grid = cfg.match_method == "grid"
    T = cfg.max_iterations
    K = max(1, int(chunk_iters))
    dtype = Xf.dtype

    if prep is not None:
        # Prepared fixed side: selection + normals arrive precomputed and
        # replicated; only the initial transform and the per-shard grid
        # build remain in the prologue program.
        Q, normals, planarity, sel_gidx, sel_valid = prep
        H0, error, grid = _prep_prologue_sharded(
            Xm, m_valid, obs_vals, cfg=cfg, mesh=mesh, ndev=ndev,
            build_grid=use_grid,
        )
    else:
        (Q, normals, planarity, sel_gidx, sel_valid, error, H0, grid
         ) = _icp_prologue_sharded(
            Xf, f_valid, Xm, m_valid, ext_sel, obs_vals, normals_fix,
            planarity_fix,
            cfg=cfg, has_normals=has_normals, mesh=mesh, ndev=ndev,
            build_grid=use_grid,
        )
    carry = make_carry_init(cfg, dtype, obs_vals.astype(dtype), H0, error)

    while True:
        hi = min(T, int(carry.it) + K)
        carry, uncertainties, covariance = _icp_chunk_sharded(
            carry, jnp.int32(hi), Q, normals, planarity, sel_valid,
            obs_vals, obs_w, Xm, m_valid, planarity_mov, grid,
            cfg=cfg, has_mov_planarity=has_mov_planarity,
            use_grid=use_grid, mesh=mesh, ndev=ndev,
        )
        if (bool(carry.converged) or int(carry.error) != ERR_OK
                or int(carry.it) >= T):
            break

    return _result_from_carry(
        carry, uncertainties, covariance, sel_gidx, sel_valid, normals,
        planarity,
    )


def icp_register_sharded(
    X_fix,
    X_mov,
    cfg: IcpConfig = IcpConfig(),
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    rbp_observed_values=None,
    rbp_observation_weights=None,
    normals_fix=None,
    planarity_fix=None,
    planarity_mov=None,
    fixed_prep=None,
    dtype=None,
) -> IcpResult:
    """Multi-chip registration: same contract as models.icp.icp_register,
    with both clouds sharded over `mesh` (defaults to all devices).

    Note: `sel_idx` / `iter_midx` in the result index into the *padded*
    clouds; padding rows are never selected (validity masks), and pad indices
    equal real indices because padding is appended at the tail.

    `fixed_prep` (models.icp.prepare_fixed) replaces the prologue like in
    the single-chip driver — the preparation's replicated (C,·) arrays are
    broadcast to the mesh and the SPMD prologue (distributed selection +
    collective kNN) is skipped. Valid because padding sits at the cloud
    tail: the sharded global indices equal the original indices the
    preparation carries. Requires nf >= correspondences in addition to
    the single-chip constraints (below C the two engines fill the unused
    selection slots differently — masked everywhere, but the masked
    result fields would not be bit-comparable).
    """
    if mesh is None:
        mesh = make_mesh()
    ndev = int(np.prod(mesh.devices.shape))
    axis = mesh.axis_names[0]

    if fixed_prep is not None and np.shape(X_fix)[0] < cfg.correspondences:
        # sharded-specific constraint on top of _validate_fixed_prep below:
        # below C the sharded and host selection engines fill the masked
        # padding slots differently (0 vs clamped nf-1), so the result
        # fields would not be bit-comparable
        raise ValueError(
            "fixed_prep under sharding requires at least "
            "`correspondences` fixed points (the sharded and host "
            "selection engines fill sub-C padding slots differently)"
        )

    # The distributed selection reuses round_linspace with the global
    # selected count; the same proven-domain guard as the single-chip
    # driver applies (models/icp.py). np.shape reads the length without
    # materializing a device-resident cloud host-side (CLAUDE.md: a
    # np.asarray here would be a hidden full device->host fetch).
    from ..models.icp import _check_round_linspace_domain

    _check_round_linspace_domain(cfg.correspondences, np.shape(X_fix)[0])

    # Same NN ref-tile auto-scaling as the single-chip driver, but against
    # the per-shard movable block size (the scan per device runs over its
    # local rows only).
    if cfg.ref_tile == 0:
        import dataclasses

        # np.shape: length without a hidden device->host cloud fetch
        local_rows = -(-np.shape(X_mov)[0] // ndev)
        rt_auto = 1 << max(12, min(16, (local_rows // 8).bit_length()))
        cfg = dataclasses.replace(cfg, ref_tile=rt_auto)

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)

    if fixed_prep is not None:
        from ..models.icp import _validate_fixed_prep

        _validate_fixed_prep(fixed_prep, int(np.shape(X_fix)[0]), cfg,
                             np_dtype, normals_fix, "icp_register_sharded")

    # Coarse-to-fine warm start: the coarse pass runs single-device on
    # stride-subsampled clouds (models/icp.py plan_warm_start), its result
    # feeding the initial rbp values — which also sharpen the gate's H0
    # below. Single-process only: under multi-host each process holds only
    # its shard, so no process could run the coarse registration alone.
    if cfg.warm_start:
        if jax.process_count() > 1:
            raise ValueError(
                "warm_start is not supported multi-host (no process holds "
                "the whole cloud for the coarse pass); pass a coarse "
                "result as rbp_observed_values with zero weights instead."
            )
        from ..models.icp import plan_warm_start

        cfg, rbp_observed_values = plan_warm_start(
            X_fix, X_mov, cfg,
            rbp_observed_values=rbp_observed_values,
            rbp_observation_weights=rbp_observation_weights,
            normals_fix=normals_fix, planarity_fix=planarity_fix,
            planarity_mov=planarity_mov, dtype=dtype,
        )

    # Overlap-gate engine resolution, mirroring models.icp.icp_register:
    # dense ring below ~1e12 pairs; past that the dilated-occupancy gate
    # (computed once up front on the unsharded clouds — single-process
    # only, multi-host keeps the ring engines since no process holds the
    # whole movable cloud) with the traveling sorted cell lists as the
    # volumetric-extent fallback.
    ext_sel_mask = None
    if cfg.overlap_enabled:
        import dataclasses

        nf_, nm_ = np.shape(X_fix)[0], np.shape(X_mov)[0]
        resolved = cfg.gate_method
        plan = None
        single_proc = jax.process_count() == 1
        if resolved in ("auto", "dilate") and single_proc:
            from ..ops.dilate_gate import bbox_of, plan_dilate_gate

            want = resolved == "dilate" or nf_ * nm_ > 2**40
            if want:
                Xf_d = jnp.asarray(np.asarray(X_fix, np_dtype))
                Xm_d = jnp.asarray(np.asarray(X_mov, np_dtype))
                obs_d = (
                    jnp.zeros(6, np_dtype) if rbp_observed_values is None
                    else jnp.asarray(rbp_observed_values, np_dtype)
                )
                H0_dev = rbp_to_H(obs_d)
                lo, hi = bbox_of(Xf_d, Xm_d, H0_dev)
                plan = plan_dilate_gate(
                    None, None, cfg.max_overlap_distance,
                    bbox=(np.asarray(lo), np.asarray(hi)),
                )
        if resolved == "dilate" and plan is None:
            raise ValueError(
                "gate_method='dilate' needs a single-process run and a "
                "dense cell grid over the movable bounding box — use "
                "'grid' or 'auto'."
            )
        if plan is not None:
            from ..ops.dilate_gate import overlap_mask_dilate

            resolved = "dilate"
            ext_sel_mask = overlap_mask_dilate(
                Xf_d, Xm_d, H0_dev, cfg.max_overlap_distance, plan,
                Xm_host=X_mov if isinstance(X_mov, np.ndarray) else None,
            )
        elif resolved == "auto":
            resolved = "grid" if nf_ * nm_ > 2**41 else "brute"
        cap = cfg.grid_cell_cap
        if resolved == "grid" and cap == 0:
            from ..models.solver import RigidBodyParameters
            from ..ops.gridhash import grid_cell_cap

            Xm_np = np.asarray(X_mov, np.float64)
            if rbp_observed_values is not None and np.any(
                np.asarray(rbp_observed_values)
            ):
                rbp = RigidBodyParameters()
                rbp.set_parameter_attributes_from_list(
                    "estimated_value", np.asarray(rbp_observed_values)
                )
                H0_np = rbp.H
                Xm_np = Xm_np @ H0_np[:3, :3].T + H0_np[:3, 3]
            # full-cloud cap upper-bounds every shard's slot occupancy
            # (all shards bin on one global lattice, _ring_min_dist2_grid)
            cap = grid_cell_cap(Xm_np, cfg.max_overlap_distance)
        if (resolved, cap) != (cfg.gate_method, cfg.grid_cell_cap):
            cfg = dataclasses.replace(
                cfg, gate_method=resolved, grid_cell_cap=cap
            )

    from ..models.icp import resolve_match_method

    cfg = resolve_match_method(cfg, cfg.correspondences, np.shape(X_mov)[0])

    if cfg.match_method == "grid" and cfg.match_cell_cap == 0:
        import dataclasses

        from ..ops.gridhash import grid_cell_cap

        # Matcher grid is over the ORIGINAL movable cloud; the full-cloud
        # cap bounds every shard's slot occupancy (global lattice origin).
        rm = cfg.match_radius if cfg.match_radius > 0 else cfg.max_overlap_distance
        cfg = dataclasses.replace(
            cfg,
            match_cell_cap=grid_cell_cap(np.asarray(X_mov, np.float64), rm),
        )

    Xf = np.asarray(X_fix, np_dtype)
    Xm = np.asarray(X_mov, np_dtype)
    nf, nm = Xf.shape[0], Xm.shape[0]
    nf_pad = -(-nf // ndev) * ndev
    nm_pad = -(-nm // ndev) * ndev

    f_valid = np.zeros(nf_pad, bool)
    f_valid[:nf] = True
    m_valid = np.zeros(nm_pad, bool)
    m_valid[:nm] = True
    Xf = _pad_to(Xf, nf_pad)
    Xm = _pad_to(Xm, nm_pad)

    obs_vals = (np.zeros(6, np_dtype) if rbp_observed_values is None
                else np.asarray(rbp_observed_values, np_dtype))
    obs_w = (np.zeros(6, np_dtype) if rbp_observation_weights is None
             else np.asarray(rbp_observation_weights, np_dtype))

    has_normals = normals_fix is not None
    if has_normals:
        nrm = _pad_to(np.asarray(normals_fix, np_dtype), nf_pad)
        pla = _pad_to(
            np.ones(nf, np_dtype) if planarity_fix is None
            else np.asarray(planarity_fix, np_dtype),
            nf_pad,
        )
    else:
        nrm = np.zeros((nf_pad, 3), np_dtype)
        pla = np.zeros((nf_pad,), np_dtype)

    has_mov_planarity = planarity_mov is not None
    pmov = (
        _pad_to(np.asarray(planarity_mov, np_dtype), nm_pad)
        if has_mov_planarity
        else np.zeros((nm_pad,), np_dtype)
    )

    ext_pad = np.zeros(nf_pad, bool)
    if ext_sel_mask is not None:
        ext_pad[:nf] = np.asarray(ext_sel_mask)

    # ---- Dispatch planning (host-side): monolithic vs host-chunked ----
    # Mirrors models.icp.icp_register's watchdog guard with per-DEVICE
    # stage costs: the gate, normals kNN, and grid build shard over the
    # mesh (divide by ndev); the brute matcher sweeps local blocks (divide
    # by ndev); the grid matcher's candidate gathers are per replicated
    # query, so its per-iteration cost does NOT shrink with the mesh. Most
    # sharded configs therefore stay monolithic, and chunking engages only
    # for big-correspondence jobs on small meshes. No kNN query-block split
    # here: the per-device kNN is already mesh-divided, so a prologue that
    # alone exceeds the budget is refused with guidance.
    import dataclasses

    from ..utils.device_policy import estimate_tpu_stage_seconds

    dispatch = cfg.dispatch
    chunk_k = cfg.chunk_iterations
    budget = cfg.program_budget_s
    guarded = budget > 0 and jax.default_backend() != "cpu"
    if guarded:
        gate_pairs = (
            float(nf) * nm / ndev
            if cfg.overlap_enabled and ext_sel_mask is None
            and cfg.gate_method == "brute"
            else 0.0
        )
        gate_s, knn_s, build_s, per_iter_s = estimate_tpu_stage_seconds(
            nf, nm,
            correspondences=cfg.correspondences,
            neighbors=cfg.neighbors,
            gate_pairs=gate_pairs,
            match_method=cfg.match_method,
            match_cell_cap=cfg.match_cell_cap,
            # a prepared fixed side skips the collective kNN like supplied
            # normals do
            has_normals=has_normals or fixed_prep is not None,
        )
        knn_s /= ndev
        build_s /= ndev
        if cfg.match_method != "grid":
            per_iter_s /= ndev
        est = (gate_s + knn_s + build_s
               + min(10, cfg.max_iterations) * per_iter_s)
        atom_s = max(gate_s + knn_s + build_s, per_iter_s)
        if atom_s > budget * 0.9:
            raise ValueError(
                f"this sharded configuration is estimated at ~{atom_s:.0f} s "
                f"of per-device time for its largest indivisible program "
                f"(prologue ~{gate_s + knn_s + build_s:.0f} s, "
                f"~{per_iter_s:.0f} s per iteration) — even chunked dispatch "
                f"would exceed the program_budget_s={budget:g} watchdog "
                "guard (over-long programs crash TPU workers). Use more "
                "devices, reduce `correspondences`, set a small "
                "`match_radius`, or raise/disable program_budget_s if your "
                "runtime allows long programs."
            )
        if dispatch == "monolithic" and est > budget:
            raise ValueError(
                f"this sharded configuration is estimated at ~{est:.0f} s of "
                f"per-device time in ONE program, over the program_budget_s="
                f"{budget:g} watchdog guard. Use dispatch='auto'/'chunked' "
                "(bounded-size programs, identical math), more devices, or "
                "raise/disable program_budget_s."
            )
        if dispatch == "auto":
            dispatch = "monolithic" if est <= budget else "chunked"
        if dispatch == "chunked" and chunk_k == 0:
            chunk_k = max(1, int((budget * 0.5) / max(per_iter_s, 1e-9)))
        import logging

        logging.getLogger(__name__).info(
            "sharded dispatch plan: %s over %d devices (est %.1f s/device = "
            "gate %.1f + knn %.1f + build %.1f + %.2f s/iter%s; budget %g s)",
            dispatch, ndev, est, gate_s, knn_s, build_s, per_iter_s,
            f", K={chunk_k}" if dispatch == "chunked" else "", budget,
        )
    else:
        if dispatch == "auto":
            dispatch = "monolithic"
        if chunk_k == 0:
            chunk_k = 8
    # dispatch fields never reach the trace; normalize them out of the
    # jit-static cfg so plan changes don't recompile identical programs
    run_cfg = dataclasses.replace(
        cfg, dispatch="auto", chunk_iterations=0, warm_start=False,
        warm_start_points=1_000_000, warm_start_correspondences=1000,
    )

    shard1 = NamedSharding(mesh, P(axis))
    shard2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    args = (
        _put_sharded(Xf, shard2),
        _put_sharded(f_valid, shard1),
        _put_sharded(Xm, shard2),
        _put_sharded(m_valid, shard1),
        _put_sharded(ext_pad, shard1),
        jax.device_put(jnp.asarray(obs_vals), rep),
        jax.device_put(jnp.asarray(obs_w), rep),
        _put_sharded(nrm, shard2),
        _put_sharded(pla, shard1),
        _put_sharded(pmov, shard1),
    )
    prep5 = None
    if fixed_prep is not None:
        # replicate the preparation's (C,·) arrays to the mesh
        prep5 = tuple(
            jax.device_put(jnp.asarray(a), rep)
            for a in (fixed_prep.Q, fixed_prep.normals, fixed_prep.planarity,
                      fixed_prep.sel_idx, fixed_prep.sel_valid)
        )
    if dispatch == "chunked":
        return _icp_run_sharded_chunked(
            *args, cfg=run_cfg, has_normals=has_normals,
            has_mov_planarity=has_mov_planarity, mesh=mesh, ndev=ndev,
            chunk_iters=chunk_k, prep=prep5,
        )
    return _icp_run_sharded(
        *args, cfg=run_cfg, has_normals=has_normals,
        has_mov_planarity=has_mov_planarity, mesh=mesh, ndev=ndev,
        prep=prep5,
    )
