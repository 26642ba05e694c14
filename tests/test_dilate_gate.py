"""Dilated-occupancy gate: exact agreement with the brute-force mask.

The gate's contract is bit-exactness of `min_dist(q, refs) <= radius` —
the dilation stencils only PROVE membership (IN) or non-membership
(not-POSS); everything uncertain is resolved with real distance checks.
These tests drive the full pipeline (plan -> classify -> band resolve)
against the dense sweep on adversarial geometries: points ON cell
boundaries, distances straddling the radius, degenerate planes, empty
bands, huge bands.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from simpleicp_tpu.ops.dilate_gate import (
    classify_queries,
    overlap_mask_dilate,
    plan_dilate_gate,
)
from simpleicp_tpu.ops.knn import min_dist_sq


def _brute_mask(Xf, Xm0, r):
    d2 = np.asarray(min_dist_sq(jnp.asarray(Xf), jnp.asarray(Xm0)))
    return d2 <= r * r


def _dilate_mask(Xf, Xm, r, H0=None, host_copy=False, cell_div=None):
    if H0 is None:
        H0 = np.eye(4)
    plan = plan_dilate_gate(
        Xf, Xm @ H0[:3, :3].T + H0[:3, 3], r, cell_div=cell_div
    )
    assert plan is not None
    return overlap_mask_dilate(
        jnp.asarray(Xf), jnp.asarray(Xm), jnp.asarray(H0), r, plan,
        Xm_host=np.asarray(Xm) if host_copy else None,
    )


@pytest.mark.parametrize("r", [0.05, 0.13, 0.5])
def test_random_clouds_match_brute(rng, r):
    Xf = rng.uniform(-1, 1, size=(4000, 3))
    Xm = rng.uniform(-1, 1, size=(3000, 3)) + np.array([0.4, 0.0, 0.0])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


@pytest.mark.parametrize("cell_div", [8, 4, 2])
def test_coarse_lattices_match_brute(rng, cell_div):
    """Exactness must hold at every lattice resolution, not just the
    finest-fitting one the auto planner picks (coarse lattices = thicker
    exactly-resolved band, same predicate)."""
    r = 0.13
    Xf = rng.uniform(-1, 1, size=(4000, 3))
    Xm = rng.uniform(-1, 1, size=(3000, 3)) + np.array([0.4, 0.0, 0.0])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r, cell_div=cell_div), _brute_mask(Xf, Xm, r)
    )


def test_boundary_distances_exact(rng):
    """Queries placed EXACTLY at radius +/- tiny from a ref: the band must
    resolve them with true distances."""
    r = 0.25
    # sparse refs (separation >> 2r) so each query interacts with exactly
    # one ref and the inside/outside classes are unambiguous
    g = np.arange(5) * 2.0
    Xm = np.stack(np.meshgrid(g, g, g), axis=-1).reshape(-1, 3)
    eps = 1e-9
    inside = Xm[:50] + np.array([r - eps, 0, 0])
    outside = Xm[50:100] + np.array([r + 1e-6, 0, 0])
    Xf = np.concatenate([inside, outside])
    mask = _dilate_mask(Xf, Xm, r)
    ref = _brute_mask(Xf, Xm, r)
    np.testing.assert_array_equal(mask, ref)
    assert ref[:50].all() and not ref[50:].any()


def test_grid_aligned_points(rng):
    """Quantized coordinates sit exactly on cell boundaries — the margins
    must route any ambiguity into the band, never into a wrong answer."""
    r = 0.2
    Xm = np.round(rng.uniform(-1, 1, size=(2000, 3)) * 10) / 10
    Xf = np.round(rng.uniform(-1, 1, size=(2000, 3)) * 10) / 10
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_planar_degenerate(rng):
    r = 0.1
    xy = rng.uniform(-1, 1, size=(1500, 2))
    Xf = np.column_stack([xy, np.zeros(1500)])
    Xm = np.column_stack([xy[:1000] + 0.03, np.full(1000, 0.05)])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_disjoint_clouds_all_false(rng):
    r = 0.1
    Xf = rng.uniform(0, 1, size=(500, 3))
    Xm = rng.uniform(5, 6, size=(500, 3))
    assert not _dilate_mask(Xf, Xm, r).any()


def test_coincident_clouds_all_true(rng):
    r = 0.1
    Xf = rng.uniform(0, 1, size=(500, 3))
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xf.copy(), r), np.ones(500, bool)
    )


def test_initial_transform_applied(rng):
    """The gate must bin the movable cloud AFTER H0 (Q10)."""
    r = 0.15
    Xf = rng.uniform(-1, 1, size=(1000, 3))
    a = 0.3
    H0 = np.eye(4)
    H0[:3, :3] = [
        [np.cos(a), -np.sin(a), 0],
        [np.sin(a), np.cos(a), 0],
        [0, 0, 1.0],
    ]
    H0[:3, 3] = [0.2, -0.1, 0.05]
    Xm = rng.uniform(-1, 1, size=(1000, 3))
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r, H0=H0), _brute_mask(Xf, Xm0, r)
    )


def test_host_copy_pack_matches_brute(rng, monkeypatch):
    """The host fallback path (occupancy packed from a HOST-side transform
    of the untransformed cloud) must stay bit-exact vs brute, including
    under an initial transform where host f64 and device transforms differ
    by a few ulp — the plan margin routes those cases into the band."""
    from simpleicp_tpu.ops import dilate_gate as dg

    monkeypatch.setattr(dg, "_DEVICE_PACK", False)
    r = 0.15
    Xf = rng.uniform(-1, 1, size=(2000, 3))
    Xm = rng.uniform(-1, 1, size=(2000, 3))
    a = 0.21
    H0 = np.eye(4)
    H0[:3, :3] = [
        [np.cos(a), 0, np.sin(a)],
        [0, 1.0, 0],
        [-np.sin(a), 0, np.cos(a)],
    ]
    H0[:3, 3] = [0.11, 0.02, -0.3]
    Xm0_dev = np.asarray(
        jnp.asarray(Xm) @ jnp.asarray(H0)[:3, :3].T + jnp.asarray(H0)[:3, 3]
    )
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r, H0=H0, host_copy=True),
        _brute_mask(Xf, Xm0_dev, r),
    )
    # grid-aligned coordinates: boundary binning flips between the host and
    # device transforms are the adversarial case
    Xmq = np.round(rng.uniform(-1, 1, size=(2000, 3)) * 10) / 10
    Xfq = np.round(rng.uniform(-1, 1, size=(2000, 3)) * 10) / 10
    np.testing.assert_array_equal(
        _dilate_mask(Xfq, Xmq, 0.2, host_copy=True),
        _brute_mask(Xfq, Xmq, 0.2),
    )


def test_device_pack_equals_host_pack(rng):
    """`_pack_occupancy_device` (sort + dedup + scatter-add-as-OR) must
    reproduce the host `pack_occupancy` word grid exactly when both bin the
    SAME already-transformed points in the same dtype — including duplicate
    points (the dedup path) and points on exact cell boundaries."""
    from simpleicp_tpu.ops import dilate_gate as dg

    pts = rng.uniform(-1, 1, size=(5000, 3)).astype(np.float32)
    pts[1000:2000] = pts[:1000]  # exact duplicates
    pts[2000:3000] = np.round(pts[2000:3000] * 20) / 20  # boundary-aligned
    for r in (0.1, 0.37):
        plan = plan_dilate_gate(None, pts, r)
        assert plan is not None
        host = dg.pack_occupancy(pts, plan, np.float32)
        dev = np.asarray(dg._pack_occupancy_device(jnp.asarray(pts), plan=plan))
        np.testing.assert_array_equal(dev, host)


def test_band_is_thin_for_dense_clouds(rng):
    """Sanity on the design premise: for dense overlapping surfaces, the
    uncertain band (the only part that pays per-query gathers) stays a
    small fraction of the queries."""
    xy = rng.uniform(-2, 2, size=(20000, 2))
    z = 0.3 * np.sin(2 * xy[:, 0])
    Xf = np.column_stack([xy, z])
    Xm = Xf + rng.normal(scale=0.01, size=Xf.shape)
    r = 0.5
    plan = plan_dilate_gate(Xf, Xm, r)
    in_mask, band_mask = classify_queries(
        jnp.asarray(Xf), jnp.asarray(Xm), jnp.asarray(np.eye(4)), plan=plan
    )
    band_frac = float(np.asarray(band_mask).mean())
    assert band_frac < 0.05, band_frac
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_pipeline_dilate_matches_brute_gate(bunny):
    """End-to-end: bunny registered with gate_method='dilate' must produce
    the identical trace as the brute gate."""
    from simpleicp_tpu import IcpConfig, icp_register

    X_fix, X_mov = bunny
    res_b = icp_register(
        X_fix, X_mov, IcpConfig(max_overlap_distance=1.0, gate_method="brute")
    )
    res_d = icp_register(
        X_fix, X_mov, IcpConfig(max_overlap_distance=1.0, gate_method="dilate")
    )
    assert int(res_d.error_code) == 0
    np.testing.assert_array_equal(
        np.asarray(res_b.sel_idx), np.asarray(res_d.sel_idx)
    )
    assert int(res_b.n_iterations) == int(res_d.n_iterations)
    np.testing.assert_allclose(
        np.asarray(res_b.H), np.asarray(res_d.H), rtol=0, atol=0
    )


def test_band_ref_compaction_exact(rng, monkeypatch):
    """Force the band-ref compaction path (normally only at >1e13 band
    pairs): the retained-ref sweep must still be bit-exact vs brute."""
    from simpleicp_tpu.ops import dilate_gate

    monkeypatch.setattr(dilate_gate, "_DIRECT_SWEEP_MAX", 0)
    r = 0.13
    Xf = rng.uniform(-1, 1, size=(4000, 3))
    Xm = rng.uniform(-1, 1, size=(3000, 3)) + np.array([0.4, 0.0, 0.0])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )
    # and with an initial transform
    a = 0.2
    H0 = np.eye(4)
    H0[:3, :3] = [
        [np.cos(a), -np.sin(a), 0],
        [np.sin(a), np.cos(a), 0],
        [0, 0, 1.0],
    ]
    H0[:3, 3] = [0.1, -0.05, 0.02]
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r, H0=H0), _brute_mask(Xf, Xm0, r)
    )


def test_band_subset_on_device_matches_host_gather(rng):
    """_band_subset_on_device(Xf, mask, cap) must equal the host-side
    Xf[nonzero(mask)] gather (fill rows = Xf[0]) — it is what lets the
    band-ref compaction consume the classify's band mask on device, at
    band-size sort cost, without the host nonzero + index re-upload on
    the critical path."""
    from simpleicp_tpu.ops import dilate_gate as dg

    P = rng.uniform(-1, 1, size=(5000, 3))
    mask = rng.uniform(size=5000) < 0.3
    plan = plan_dilate_gate(P, P, 0.1)
    k = int(mask.sum())
    cap = 2048
    assert k < cap
    got = np.asarray(
        dg._band_subset_on_device(
            jnp.asarray(P), jnp.asarray(mask), plan=plan, cap=cap
        )
    )
    np.testing.assert_array_equal(got[:k], P[mask])
    np.testing.assert_array_equal(got[k:], np.broadcast_to(P[0], (cap - k, 3)))


def test_compaction_speculative_cap_overflow_redoes_exact(rng, monkeypatch):
    """When the true band exceeds the speculative nonzero cap, the
    truncated keep mask must be DISCARDED (it could be missing refs) and
    the sequential exact-cap dispatch must redo it — end result bit-exact
    vs brute."""
    from simpleicp_tpu.ops import dilate_gate

    monkeypatch.setattr(dilate_gate, "_DIRECT_SWEEP_MAX", 0)
    # tiny band-fraction estimate + un-floored buckets force spec_cap ~1,
    # while the speculate condition (anything > 0) still holds
    monkeypatch.setattr(dilate_gate, "_BAND_FRAC_EST", 1e-4)
    monkeypatch.setattr(dilate_gate, "_bucket_size", lambda n: max(int(n), 1))
    r = 0.13
    Xf = rng.uniform(-1, 1, size=(4000, 3))
    Xm = rng.uniform(-1, 1, size=(3000, 3)) + np.array([0.4, 0.0, 0.0])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_compaction_sequential_fallback_exact(rng, monkeypatch):
    """When the speculative pipelined dispatch under-triggers
    (_BAND_FRAC_EST estimate too low) the compaction must still run via the
    sequential path and stay bit-exact vs brute."""
    from simpleicp_tpu.ops import dilate_gate

    monkeypatch.setattr(dilate_gate, "_DIRECT_SWEEP_MAX", 0)
    monkeypatch.setattr(dilate_gate, "_BAND_FRAC_EST", 0.0)
    r = 0.13
    Xf = rng.uniform(-1, 1, size=(4000, 3))
    Xm = rng.uniform(-1, 1, size=(3000, 3)) + np.array([0.4, 0.0, 0.0])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_far_queries_clip_to_rejection(rng):
    """Grid covers only the movable bbox; fixed points far outside it must
    clip to the never-POSS border and classify as rejected, while the
    overlapping subset still resolves exactly."""
    r = 0.2
    Xm = rng.uniform(0, 1, size=(2000, 3))
    near = rng.uniform(-0.3, 1.3, size=(1500, 3))
    far = rng.uniform(50, 80, size=(500, 3)) * rng.choice(
        [-1, 1], size=(500, 3)
    )
    Xf = np.concatenate([near, far])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_slab_join_sweep_matches_brute(rng, monkeypatch):
    """Force the band-ref compaction AND the slab-join sweep on a small
    cloud pair (thresholds lowered to 0/1) — the chunked, coordinate-range
    restricted sweep must reproduce the brute mask bit for bit."""
    from simpleicp_tpu.ops import dilate_gate as dg

    monkeypatch.setattr(dg, "_DIRECT_SWEEP_MAX", 1)
    monkeypatch.setattr(dg, "_SLAB_SWEEP_MIN", 1)
    monkeypatch.setattr(dg, "_SLAB_CHUNK_OPTS", (64, 256))
    monkeypatch.setattr(dg, "_SLAB1_MIN", 16)  # force multi-block y splits
    r = 0.11
    Xf = rng.uniform(-1, 1, size=(3000, 3)) * np.array([4.0, 1.0, 1.0])
    Xm = rng.uniform(-1, 1, size=(2500, 3)) * np.array([4.0, 1.0, 1.0])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_slab_join_with_initial_transform(rng, monkeypatch):
    from simpleicp_tpu.ops import dilate_gate as dg
    from simpleicp_tpu.ops.transform import rbp_to_H

    monkeypatch.setattr(dg, "_DIRECT_SWEEP_MAX", 1)
    monkeypatch.setattr(dg, "_SLAB_SWEEP_MIN", 1)
    monkeypatch.setattr(dg, "_SLAB_CHUNK_OPTS", (128,))
    monkeypatch.setattr(dg, "_SLAB1_MIN", 32)
    r = 0.2
    Xf = rng.uniform(-1, 1, size=(2000, 3)) * np.array([1.0, 3.0, 1.0])
    Xm = rng.uniform(-1, 1, size=(2200, 3)) * np.array([1.0, 3.0, 1.0])
    H0 = np.asarray(rbp_to_H(jnp.asarray([0.02, -0.01, 0.05, 0.1, -0.2, 0.3])))
    Xm0 = Xm @ H0[:3, :3].T + H0[:3, 3]
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r, H0=H0), _brute_mask(Xf, Xm0, r)
    )


def test_blocked_slab_join_multi_call(rng, monkeypatch):
    """Force the blocked 2-D slab join to split its blocks across MULTIPLE
    device calls (tiny pair budget) — the group padding / result scatter
    bookkeeping must stay bit-exact vs brute."""
    from simpleicp_tpu.ops import dilate_gate as dg

    monkeypatch.setattr(dg, "_DIRECT_SWEEP_MAX", 1)
    monkeypatch.setattr(dg, "_SLAB_SWEEP_MIN", 1)
    monkeypatch.setattr(dg, "_SLAB_CHUNK_OPTS", (128, 512))
    monkeypatch.setattr(dg, "_SLAB1_MIN", 32)
    monkeypatch.setattr(dg, "_SWEEP_PAIR_BUDGET", 1 << 16)
    r = 0.09
    Xf = rng.uniform(-1, 1, size=(5000, 3)) * np.array([5.0, 2.0, 1.0])
    Xm = rng.uniform(-1, 1, size=(4000, 3)) * np.array([5.0, 2.0, 1.0])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_blocked_slab_join_skewed_density(rng, monkeypatch):
    """Density-skewed clouds (one dense cluster + a sparse field) drive the
    per-call slice-width buckets: block candidate counts span orders of
    magnitude, so the fill-sorted grouping issues calls with DIFFERENT W_g
    shapes — the scatter of results back through the sort permutation must
    stay bit-exact vs brute."""
    from simpleicp_tpu.ops import dilate_gate as dg

    monkeypatch.setattr(dg, "_DIRECT_SWEEP_MAX", 1)
    monkeypatch.setattr(dg, "_SLAB_SWEEP_MIN", 1)
    monkeypatch.setattr(dg, "_SLAB_CHUNK_OPTS", (256,))
    monkeypatch.setattr(dg, "_SLAB1_MIN", 16)
    monkeypatch.setattr(dg, "_SWEEP_PAIR_BUDGET", 1 << 15)
    r = 0.12
    dense = rng.normal(0.0, 0.03, size=(2500, 3)) + np.array([3.0, 0.2, 0.0])
    sparse = rng.uniform(-1, 1, size=(1500, 3)) * np.array([4.0, 1.0, 1.0])
    Xm = np.concatenate([dense, sparse])
    Xf = np.concatenate([
        rng.normal(0.0, 0.05, size=(800, 3)) + np.array([3.0, 0.2, 0.0]),
        rng.uniform(-1, 1, size=(1200, 3)) * np.array([4.0, 1.0, 1.0]),
    ])
    np.testing.assert_array_equal(
        _dilate_mask(Xf, Xm, r), _brute_mask(Xf, Xm, r)
    )


def test_slab_planner_edge_cases(rng):
    """_pick_slab_chunk_2d must return a candidate size and survive
    degenerate geometry: constant-y reference windows (r_span=0), fully
    disjoint x ranges (every window empty -> early return), and query
    sets smaller than the smallest slab."""
    from simpleicp_tpu.ops import dilate_gate as dg

    qx = np.sort(rng.uniform(0, 100, 300_000))
    qy = rng.uniform(0, 30, 300_000)
    rx = np.sort(rng.uniform(0, 100, 250_000))
    ry = rng.uniform(0, 30, 250_000)
    assert dg._pick_slab_chunk_2d(qx, qy, rx, ry, 0.05) in dg._SLAB_CHUNK_OPTS
    assert (
        dg._pick_slab_chunk_2d(qx, qy, rx, np.zeros_like(ry), 0.05)
        in dg._SLAB_CHUNK_OPTS
    )
    # disjoint: no slab sees any ref; the planner must not divide by zero
    assert (
        dg._pick_slab_chunk_2d(qx, qy, rx + 1000.0, ry, 0.05)
        in dg._SLAB_CHUNK_OPTS
    )
    assert (
        dg._pick_slab_chunk_2d(qx[:100], qy[:100], rx, ry, 0.05)
        in dg._SLAB_CHUNK_OPTS
    )


def test_native_argsort_matches_numpy(rng):
    """The native parallel radix argsort (slab-join planning) returns the
    exact stable permutation numpy produces, including heavy duplicates
    and +/-inf. (-0.0/+0.0 tie order is documented to differ; coordinate
    planning never hits signed zeros on both sides of a tie.)"""
    try:
        from simpleicp_tpu.native import argsort_native
    except ImportError:
        pytest.skip("native library not built")
    for dt in (np.float32, np.float64):
        x = rng.uniform(-300.0, 300.0, 200_000).astype(dt)
        np.testing.assert_array_equal(
            argsort_native(x), np.argsort(x, kind="stable")
        )
        dup = rng.integers(0, 37, 100_000).astype(dt)
        np.testing.assert_array_equal(
            argsort_native(dup), np.argsort(dup, kind="stable")
        )
    x = np.array([3.0, -np.inf, np.inf, -3.0, 0.0, 2.5, -2.5, np.inf])
    np.testing.assert_array_equal(
        argsort_native(x), np.argsort(x, kind="stable")
    )
