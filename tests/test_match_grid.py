"""Static-grid in-loop matcher (match_method="grid").

The grid matcher builds ONE cell list over the original movable cloud and
matches every iteration with back-transformed queries (rigid motion preserves
distances, so NN(q, H x) == NN(H^-1 q, x)). Within `match_radius` it is
exact, so a registration must agree with the brute matcher bit-for-bit
(identical matched indices make every downstream value identical in f64).
"""

import math

import numpy as np
import pytest

from simpleicp_tpu import IcpConfig, icp_register
from simpleicp_tpu.models import icp as icp_core


def _cloud_pair(rng, n=4000, angle=0.04, t=(0.05, -0.03, 0.02)):
    """A smooth-ish random surface and a rigidly moved copy."""
    xy = rng.uniform(-1, 1, (n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(3 * xy[:, 1])
    X_fix = np.column_stack([xy, z])
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    X_mov = (X_fix - np.mean(X_fix, 0)) @ R.T + np.mean(X_fix, 0) + np.asarray(t)
    return X_fix, X_mov


def test_grid_match_equals_brute_nonlinear(rng):
    """With exact trig rotations (nonlinear solver) H stays orthogonal, the
    back-transform identity is exact, and grid == brute bit-for-bit."""
    X_fix, X_mov = _cloud_pair(rng)
    base = dict(
        solver="nonlinear", max_overlap_distance=0.5, correspondences=500
    )
    res_b = icp_register(X_fix, X_mov, IcpConfig(match_method="brute", **base))
    res_g = icp_register(X_fix, X_mov, IcpConfig(match_method="grid", **base))
    assert int(res_g.error_code) == icp_core.ERR_OK
    assert bool(res_g.converged)
    assert int(res_g.n_iterations) == int(res_b.n_iterations)
    np.testing.assert_array_equal(
        np.asarray(res_g.iter_counts), np.asarray(res_b.iter_counts)
    )
    np.testing.assert_array_equal(np.asarray(res_g.H), np.asarray(res_b.H))
    np.testing.assert_array_equal(
        np.asarray(res_g.residuals), np.asarray(res_b.residuals)
    )


def test_grid_match_equals_brute_linearized(rng):
    """The linearized solver accumulates I+skew increments, so H is only
    approximately orthogonal; back-frame distances carry an O(|alpha|^2)
    metric distortion and near-ties may resolve differently (documented in
    IcpConfig.match_method). Same basin, H within that tolerance."""
    X_fix, X_mov = _cloud_pair(rng)
    base = dict(
        solver="linearized", max_overlap_distance=0.5, correspondences=500
    )
    res_b = icp_register(X_fix, X_mov, IcpConfig(match_method="brute", **base))
    res_g = icp_register(X_fix, X_mov, IcpConfig(match_method="grid", **base))
    assert int(res_g.error_code) == icp_core.ERR_OK
    assert bool(res_g.converged)
    np.testing.assert_allclose(
        np.asarray(res_g.H), np.asarray(res_b.H), rtol=0, atol=1e-5
    )


def test_grid_match_explicit_radius_no_gate(rng):
    """match_radius works without the overlap gate."""
    X_fix, X_mov = _cloud_pair(rng, n=2000)
    cfg_b = IcpConfig(correspondences=300, solver="nonlinear")
    cfg_g = IcpConfig(
        correspondences=300, solver="nonlinear",
        match_method="grid", match_radius=0.6,
    )
    res_b = icp_register(X_fix, X_mov, cfg_b)
    res_g = icp_register(X_fix, X_mov, cfg_g)
    assert int(res_g.error_code) == icp_core.ERR_OK
    np.testing.assert_array_equal(np.asarray(res_g.H), np.asarray(res_b.H))


def test_grid_match_drops_out_of_radius(rng):
    """Queries whose NN lies beyond match_radius are dropped from the
    correspondence set for that iteration (never silently mismatched)."""
    X_fix, X_mov = _cloud_pair(rng, n=2000, angle=0.0, t=(0.0, 0.0, 0.0))
    # a far-away island in the fixed cloud: its points have no movable
    # neighbor within the match radius
    island = rng.uniform(9.0, 10.0, (200, 3))
    X_fix = np.vstack([X_fix, island])
    cfg = IcpConfig(
        correspondences=400, solver="linearized",
        match_method="grid", match_radius=0.3, min_planarity=0.0,
    )
    res = icp_register(X_fix, X_mov, cfg)
    assert int(res.error_code) == icp_core.ERR_OK
    counts = np.asarray(res.iter_counts)[: int(res.n_iterations)]
    # island queries (~9% of selections) must have been dropped
    assert counts.max() < 400
    # and the kept matches are the exact NNs: residual stats behave
    assert np.isfinite(np.asarray(res.iter_means)[: int(res.n_iterations)]).all()


def test_grid_match_requires_radius():
    with pytest.raises(ValueError, match="match_method='grid' needs a radius"):
        IcpConfig(match_method="grid", max_overlap_distance=math.inf)


def test_grid_match_sharded_parity(rng):
    """Sharded grid matcher (per-shard cell lists on one global lattice,
    min-combined winners) agrees with the single-chip grid matcher."""
    from simpleicp_tpu.parallel import make_mesh
    from simpleicp_tpu.parallel.sharded import icp_register_sharded

    X_fix, X_mov = _cloud_pair(rng, n=3000)
    cfg = IcpConfig(
        correspondences=400, solver="nonlinear",
        max_overlap_distance=0.5, match_method="grid",
    )
    res_1 = icp_register(X_fix, X_mov, cfg)
    res_8 = icp_register_sharded(X_fix, X_mov, cfg, mesh=make_mesh(8))
    assert int(res_8.error_code) == icp_core.ERR_OK
    assert int(res_8.n_iterations) == int(res_1.n_iterations)
    np.testing.assert_allclose(
        np.asarray(res_8.H), np.asarray(res_1.H), rtol=0, atol=1e-9
    )
    np.testing.assert_array_equal(
        np.asarray(res_8.iter_counts), np.asarray(res_1.iter_counts)
    )


class TestResolveMatchMethod:
    """match_method="auto" host-side resolution (models/icp.py).

    The pair budget guards against the measured TPU watchdog hazard: a
    C=1e5 x 12.5M brute in-loop match (1.25e12 pairs/iteration inside one
    while_loop program) crashed the worker (BENCHMARKS.md kernel notes).
    """

    def test_small_resolves_to_brute(self):
        cfg = IcpConfig(correspondences=1000, max_overlap_distance=1.0)
        out = icp_core.resolve_match_method(cfg, 1000, 12_500_000)
        assert out.match_method == "brute"

    def test_big_with_radius_resolves_to_grid(self):
        cfg = IcpConfig(correspondences=100_000, max_overlap_distance=1.0)
        assert cfg.match_method == "auto"
        out = icp_core.resolve_match_method(cfg, 100_000, 12_500_000)
        assert out.match_method == "grid"

    def test_big_without_radius_falls_back_to_brute(self):
        cfg = IcpConfig(correspondences=100_000)  # no gate, no match_radius
        out = icp_core.resolve_match_method(cfg, 100_000, 12_500_000)
        assert out.match_method == "brute"

    def test_explicit_choice_passes_through(self):
        cfg = IcpConfig(match_method="grid", match_radius=0.5)
        out = icp_core.resolve_match_method(cfg, 100_000, 12_500_000)
        assert out.match_method == "grid"
        cfg = IcpConfig(match_method="brute")
        out = icp_core.resolve_match_method(cfg, 100_000, 12_500_000)
        assert out.match_method == "brute"

    def test_threshold_boundary(self):
        cfg = IcpConfig(max_overlap_distance=1.0)
        at = icp_core.MATCH_AUTO_PAIR_BUDGET
        assert icp_core.resolve_match_method(cfg, 1, at).match_method == "brute"
        assert icp_core.resolve_match_method(cfg, 1, at + 1).match_method == "grid"


class TestProgramBudgetGuard:
    """Host-side watchdog guard (IcpConfig.program_budget_s)."""

    def test_estimator_flags_measured_crash_configs(self):
        from simpleicp_tpu.utils.device_policy import estimate_tpu_program_seconds

        # C=1e5 x 12.5M brute match: crashed the worker on 2026-08-19
        est = estimate_tpu_program_seconds(
            12_500_000, 12_500_000, correspondences=100_000,
            match_method="brute",
        )
        assert est > 30.0
        # same with the fat-cap grid matcher (cell = overlap radius)
        est = estimate_tpu_program_seconds(
            12_500_000, 12_500_000, correspondences=100_000,
            match_method="grid", match_cell_cap=5000,
        )
        assert est > 30.0
        # the reference-scale and 100M ungated C=1000 configs are fine
        assert estimate_tpu_program_seconds(100_000, 100_000) < 30.0
        assert estimate_tpu_program_seconds(100_000_000, 100_000_000) < 30.0
        # A tight match_radius (small cap) does NOT make large-C grid
        # matching monolithic-safe: the normals kNN alone is ~80 s at the
        # CALIBRATED k=10 rate (round 3 — this exact config crashed the
        # worker when the round-2 model priced the kNN at the sweep rate).
        # It IS chunkable: every indivisible stage fits the budget.
        from simpleicp_tpu.utils.device_policy import (
            estimate_tpu_stage_seconds,
        )

        est = estimate_tpu_program_seconds(
            12_500_000, 12_500_000, correspondences=100_000,
            match_method="grid", match_cell_cap=30,
        )
        assert est > 30.0  # monolithic would trip the watchdog
        gate_s, knn_s, build_s, per_iter = estimate_tpu_stage_seconds(
            12_500_000, 12_500_000, correspondences=100_000,
            match_method="grid", match_cell_cap=30,
        )
        assert knn_s > 30.0  # the dominant (and query-blockable) stage
        # chunkable atoms: gate+build program, one iteration, minimal block
        assert gate_s + build_s < 30.0 * 0.9
        assert per_iter < 30.0 * 0.9
        assert knn_s * 2048.0 / 100_000 < 30.0 * 0.9

    def test_guard_raises_on_accelerator_backend(self, rng, monkeypatch):
        import jax

        from simpleicp_tpu import icp_register

        X_fix, X_mov = _cloud_pair(rng, n=500)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cfg = IcpConfig(correspondences=120, program_budget_s=1e-12)
        with pytest.raises(ValueError, match="program_budget_s"):
            icp_register(X_fix, X_mov, cfg)
        # budget 0 disables the guard; the program runs (on the cpu
        # platform underneath — default_backend is only consulted by the
        # guard)
        cfg = IcpConfig(correspondences=120, program_budget_s=0.0)
        res = icp_register(X_fix, X_mov, cfg)
        assert int(res.error_code) == icp_core.ERR_OK


def test_grid_caps_from_device_resident_clouds(rng):
    """Device-resident (jax array) inputs resolve the grid caps ON DEVICE
    (one-scalar readback) instead of fetching the whole cloud to the host —
    results must be identical to host-resident inputs (any valid occupancy
    bound gives the same matches; only the scan width differs)."""
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register

    X_fix, X_mov = _cloud_pair(rng, n=4001)
    for cfg in (
        IcpConfig(correspondences=300, max_overlap_distance=0.5,
                  match_method="grid", max_iterations=30),
        IcpConfig(correspondences=300, max_overlap_distance=0.5,
                  gate_method="grid", max_iterations=30),
    ):
        res_np = icp_register(X_fix, X_mov, cfg)
        res_dev = icp_register(jnp.asarray(X_fix), jnp.asarray(X_mov), cfg)
        assert int(res_np.error_code) == 0
        np.testing.assert_array_equal(
            np.asarray(res_np.H), np.asarray(res_dev.H)
        )
        np.testing.assert_array_equal(
            np.asarray(res_np.iter_counts), np.asarray(res_dev.iter_counts)
        )
