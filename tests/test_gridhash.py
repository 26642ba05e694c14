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


def test_knn_grid_bitequal_dense_random(rng):
    """Certified grid-kNN rows must be BIT-equal to the dense kernel
    (distances, indices, order) — the exactness contract the chunked
    prologue's normals rely on."""
    from simpleicp_tpu.ops.gridhash import knn_search_grid
    from simpleicp_tpu.ops.knn import knn_search

    refs = rng.uniform(0, 1, (20_000, 3))
    queries = rng.uniform(0, 1, (3_000, 3))
    k = 10
    d_ref, i_ref = knn_search(jnp.asarray(queries), jnp.asarray(refs), k)
    # generous radius: every row should certify
    r = float(np.sqrt(np.asarray(d_ref)[:, -1].max())) * 1.3
    cap = grid_cell_cap(refs, r)
    d_g, i_g, cert = knn_search_grid(
        jnp.asarray(queries), jnp.asarray(refs), r, k, cell_cap=cap
    )
    cert = np.asarray(cert)
    assert cert.all()
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(d_g), np.asarray(d_ref))


def test_knn_grid_tie_break_parity():
    """Adversarial ties: a regular lattice makes many candidates exactly
    equidistant; the grid path must resolve every tie to the same (lowest)
    original index as the dense kernel's stable top_k."""
    from simpleicp_tpu.ops.gridhash import knn_search_grid
    from simpleicp_tpu.ops.knn import knn_search

    g = np.arange(8, dtype=np.float64)
    refs = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    rng = np.random.default_rng(3)
    refs = refs[rng.permutation(len(refs))]  # scramble index order
    interior = ((refs >= 1) & (refs <= 5)).all(axis=1)
    queries = refs[interior][:500] + 0.5  # centers: 8 nearest tie at 0.75
    k = 12
    d_ref, i_ref = knn_search(jnp.asarray(queries), jnp.asarray(refs), k)
    r = 2.1
    cap = grid_cell_cap(refs, r)
    d_g, i_g, cert = knn_search_grid(
        jnp.asarray(queries), jnp.asarray(refs), r, k, cell_cap=cap
    )
    assert np.asarray(cert).all()
    np.testing.assert_array_equal(np.asarray(d_g), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_ref))


def test_knn_grid_certificate_gates_small_radius(rng):
    """With a radius below the true k-NN distance the certificate must be
    False (never silently wrong): uncertified rows are allowed to differ,
    certified rows must still match the dense kernel."""
    from simpleicp_tpu.ops.gridhash import knn_search_grid
    from simpleicp_tpu.ops.knn import knn_search

    refs = rng.uniform(0, 1, (5_000, 3))
    queries = rng.uniform(0, 1, (1_000, 3))
    k = 10
    d_ref, i_ref = knn_search(jnp.asarray(queries), jnp.asarray(refs), k)
    d10 = np.sqrt(np.asarray(d_ref)[:, -1])
    r = float(np.median(d10)) * 0.8  # half the rows cannot certify
    cap = grid_cell_cap(refs, r)
    d_g, i_g, cert = knn_search_grid(
        jnp.asarray(queries), jnp.asarray(refs), r, k, cell_cap=cap
    )
    cert = np.asarray(cert)
    assert 0 < cert.sum() < len(queries)
    np.testing.assert_array_equal(
        np.asarray(i_g)[cert], np.asarray(i_ref)[cert]
    )
    np.testing.assert_array_equal(
        np.asarray(d_g)[cert], np.asarray(d_ref)[cert]
    )
    # rows whose true d_k fits well inside the certified radius DID certify
    assert cert[d10 < r * 0.9].all()
