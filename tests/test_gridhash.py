"""Spatial-hash (cell list) radius NN vs scipy cKDTree, and grid vs brute
overlap gate inside the full registration."""

import numpy as np
from scipy.spatial import cKDTree

import jax.numpy as jnp

from simpleicp_tpu import IcpConfig, icp_register
from simpleicp_tpu.ops.gridhash import grid_cell_cap, nn_within_radius_grid


def test_grid_matches_kdtree_mixed_density(rng):
    refs = np.concatenate([
        rng.uniform(0, 10, (20000, 3)),
        rng.normal(5.0, 0.1, (3000, 3)),  # dense cluster stresses cell_cap
    ])
    queries = rng.uniform(-2, 12, (5003, 3))  # partly outside the ref bbox
    radius = 0.5
    cap = grid_cell_cap(refs, radius)
    d2, idx = nn_within_radius_grid(
        jnp.asarray(queries), jnp.asarray(refs), radius, cell_cap=cap
    )
    d2, idx = np.asarray(d2), np.asarray(idx)
    dd, ii = cKDTree(refs).query(queries, distance_upper_bound=radius)
    within = np.isfinite(dd)
    np.testing.assert_array_equal(d2 <= radius**2, within)
    np.testing.assert_array_equal(idx[within], ii[within])
    np.testing.assert_allclose(d2[within], dd[within] ** 2, rtol=1e-12)


def test_grid_gate_registration_matches_brute(bunny):
    X_fix, X_mov = bunny
    cfg_b = IcpConfig(max_overlap_distance=1.0, gate_method="brute")
    cfg_g = IcpConfig(max_overlap_distance=1.0, gate_method="grid")
    res_b = icp_register(X_fix, X_mov, cfg_b)
    res_g = icp_register(X_fix, X_mov, cfg_g)
    assert int(res_b.error_code) == 0 and int(res_g.error_code) == 0
    # identical gate -> identical selection -> identical registration
    np.testing.assert_array_equal(
        np.asarray(res_b.sel_idx), np.asarray(res_g.sel_idx)
    )
    np.testing.assert_allclose(
        np.asarray(res_b.H), np.asarray(res_g.H), atol=1e-12
    )
    assert int(res_b.n_iterations) == int(res_g.n_iterations)


def test_grid_gate_no_overlap_flag(rng):
    refs = rng.uniform(0, 1, (500, 3))
    queries = refs + 100.0
    cap = grid_cell_cap(refs, 0.25)
    d2, _ = nn_within_radius_grid(
        jnp.asarray(queries), jnp.asarray(refs), 0.25, cell_cap=cap
    )
    assert np.all(np.isinf(np.asarray(d2)))
