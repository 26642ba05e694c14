"""Georeferenced (large-coordinate) clouds: the API's exact host-side
centering, and the f32 rationale behind it."""

import numpy as np
import pytest

import jax.numpy as jnp

from simpleicp_tpu import IcpConfig, PointCloud, SimpleICP, icp_register

UTM_OFFSET = np.array([4.5e5, 5.2e6, 300.0])


def _surface(rng, n=15000):
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    return np.column_stack([xy, z])


def _true_H():
    a = np.deg2rad(0.6)
    R = np.array([
        [np.cos(a), -np.sin(a), 0.0],
        [np.sin(a), np.cos(a), 0.0],
        [0.0, 0.0, 1.0],
    ])
    t = np.array([0.08, -0.05, 0.03])
    H = np.eye(4)
    H[:3, :3], H[:3, 3] = R, t
    return H


def test_centered_identifies_translation_at_utm_scale(rng):
    """At UTM scale a tiny rotation about the distant origin is locally
    indistinguishable from a translation (the gauge-degenerate valley), so
    only the centered run is guaranteed to identify the true parameters.
    The uncentered run must still produce a valid ALIGNMENT (some point in
    the valley), just not necessarily the canonical parameters."""
    X_fix = _surface(rng) + UTM_OFFSET
    t = np.array([0.08, -0.05, 0.03])
    X_mov = X_fix - t

    Hs = {}
    for center in (True, False):
        icp = SimpleICP(verbose=False)
        icp.add_point_clouds(PointCloud(X_fix.copy()), PointCloud(X_mov.copy()))
        H, _, _, _ = icp.run(center=center)
        Hs[center] = H
    # centered: exact parameter identification
    np.testing.assert_allclose(Hs[True][:3, 3], t, atol=1e-6)
    # uncentered: alignment quality only
    X_chk = X_mov @ Hs[False][:3, :3].T + Hs[False][:3, 3]
    assert np.sqrt(np.mean((X_chk - X_fix) ** 2)) < 1e-3


def test_centered_recovers_rotation_at_utm_scale(rng):
    """A rotation about a 5e6-distant centroid makes the uncentered normal
    equations ~1e13-conditioned (rotation/translation column scales) — the
    regime centering exists for. The centered run must recover the motion
    exactly; we don't require the uncentered run to."""
    X_fix = _surface(rng) + UTM_OFFSET
    H_loc = _true_H()
    cpt = X_fix.mean(axis=0)
    R = H_loc[:3, :3]
    t = H_loc[:3, 3] + cpt - R @ cpt  # rotate about centroid + small shift
    X_mov = (X_fix - t) @ R

    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    H, _, _, _ = icp.run(center=True)
    X_chk = X_mov @ H[:3, :3].T + H[:3, 3]
    assert np.sqrt(np.mean((X_chk - X_fix) ** 2)) < 1e-3


def test_centering_disabled_with_translation_observation(rng):
    """A finite translation observation refers to the original frame;
    centering must silently stay off and semantics must hold exactly."""
    X_fix = _surface(rng, 8000) + UTM_OFFSET
    X_mov = X_fix - np.array([0.05, 0.02, -0.01])
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    H, _, rbp, _ = icp.run(
        rbp_observed_values=(0, 0, 0, 0.05, 0, 0),
        rbp_observation_weights=(0, 0, 0, np.inf, 0, 0),
        center=True,
    )
    np.testing.assert_allclose(rbp.tx.estimated_value, 0.05, atol=1e-12)


def test_f32_needs_centering(rng):
    """The rationale: at UTM scale the f32 pipeline only works on centered
    coordinates. (Functional API, f32 explicitly.)"""
    X_fix = _surface(rng) + UTM_OFFSET
    X_mov = X_fix - np.array([0.08, -0.05, 0.03])

    c = X_fix.mean(axis=0)
    res = icp_register(
        X_fix - c, X_mov - c, IcpConfig(), dtype=jnp.float32
    )
    assert int(res.error_code) == 0 and bool(res.converged)
    p = np.asarray(res.p, np.float64)
    np.testing.assert_allclose(p[3:], [0.08, -0.05, 0.03], atol=5e-3)


def test_initial_guess_mapping_under_centering(rng):
    """Observed values with zero weights (pure initial transform) must be
    mapped into the centered frame exactly (t0' = t0 + R0 c - c)."""
    X_fix = _surface(rng, 10000) + UTM_OFFSET
    a = np.deg2rad(20.0)
    R = np.array([
        [np.cos(a), -np.sin(a), 0.0],
        [np.sin(a), np.cos(a), 0.0],
        [0.0, 0.0, 1.0],
    ])
    center_pt = X_fix.mean(axis=0)
    # rotate movable about the cloud centroid by -20 deg
    X_mov = (X_fix - center_pt) @ R + center_pt
    t0 = center_pt - R @ center_pt  # H0 guess: rotation about centroid

    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    H, _, rbp, residuals = icp.run(
        rbp_observed_values=(0.0, 0.0, 20.0, *t0),
        rbp_observation_weights=(0.0,) * 6,
        center=True,
    )
    assert abs(rbp.alpha3.estimated_value_scaled - 20.0) < 0.5
    assert np.std(residuals) < 0.05
