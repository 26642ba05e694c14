"""NN/kNN tiled kernels vs the scipy cKDTree oracle (the reference's engine,
/root/reference/python/simpleicp/pointcloud.py:161)."""

import numpy as np
from scipy import spatial

from simpleicp_tpu.ops.knn import knn_search, min_dist_sq, nn_search


def test_nn_search_matches_kdtree(rng):
    refs = rng.normal(size=(5000, 3))
    queries = rng.normal(size=(1234, 3))
    d2, idx = nn_search(queries, refs, ref_tile=512, query_tile=256)
    tree = spatial.cKDTree(refs)
    d_ref, idx_ref = tree.query(queries, k=1)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), d_ref, rtol=1e-10)


def test_nn_search_large_offset_robustness(rng):
    # Clouds far from the origin stress the matmul-identity cancellation;
    # internal centering must keep results exact in f64 and correct in f32.
    refs = rng.normal(size=(2000, 3)) * 0.01 + np.array([1e4, -2e4, 3e4])
    queries = refs[rng.integers(0, 2000, 500)] + rng.normal(size=(500, 3)) * 1e-4
    d2, idx = nn_search(queries, refs)
    tree = spatial.cKDTree(refs)
    d_ref, idx_ref = tree.query(queries, k=1)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)


def test_knn_search_matches_kdtree(rng):
    refs = rng.normal(size=(3000, 3))
    queries = rng.normal(size=(500, 3))
    k = 10
    d2, idx = knn_search(queries, refs, k, ref_tile=512, query_tile=128)
    tree = spatial.cKDTree(refs)
    d_ref, idx_ref = tree.query(queries, k=k)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), d_ref, rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)


def test_knn_self_query_includes_self(rng):
    pts = rng.normal(size=(100, 3))
    d2, idx = knn_search(pts, pts, 3)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(100))
    np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-12)


def test_min_dist_sq_overlap_gate(rng):
    refs = rng.uniform(0, 1, size=(1000, 3))
    queries = np.array([[0.5, 0.5, 0.5], [10.0, 10.0, 10.0]])
    d2 = np.asarray(min_dist_sq(queries, refs))
    assert d2[0] < 0.1**2
    assert d2[1] > 5.0**2


def test_small_inputs():
    refs = np.array([[0.0, 0, 0], [1, 0, 0], [0, 2, 0]])
    queries = np.array([[0.9, 0.1, 0.0]])
    d2, idx = nn_search(queries, refs)
    assert int(idx[0]) == 1
    d2k, idxk = knn_search(queries, refs, 3)
    assert list(np.asarray(idxk)[0]) == [1, 0, 2]


def test_knn_approx_flag(rng):
    """approx=True (hardware-assisted partial top-k on TPU; exact fallback
    on CPU) keeps the contract: sorted ascending, exact distances."""
    from scipy.spatial import cKDTree

    import jax.numpy as jnp

    from simpleicp_tpu.ops.knn import knn_search

    q = rng.uniform(-5, 5, (300, 3))
    r = rng.uniform(-5, 5, (8000, 3))
    d2, idx = knn_search(jnp.asarray(q), jnp.asarray(r), 8, approx=True)
    dd, ii = cKDTree(r).query(q, k=8)
    # CPU backend: approx_min_k falls back to exact
    np.testing.assert_array_equal(np.asarray(idx), ii)
    np.testing.assert_allclose(np.asarray(d2), dd**2, rtol=1e-10)


def test_knn_onepass_equals_tile_scan(rng, monkeypatch):
    """The fused one-pass kNN (small query x ref products) and the tile
    scan must agree exactly — including index order on duplicate points
    (both tie-break toward the lower reference index)."""
    import simpleicp_tpu.ops.knn as knn_mod

    refs = rng.normal(size=(3000, 3))
    refs[100:110] = refs[50:60]  # duplicates -> distance ties
    queries = np.concatenate([rng.normal(size=(200, 3)), refs[45:65]])
    d_one, i_one = knn_search(queries, refs, 5, ref_tile=512)
    monkeypatch.setattr(knn_mod, "_ONEPASS_ELEMS", 0)
    knn_mod.knn_search.clear_cache()
    d_scan, i_scan = knn_search(queries, refs, 5, ref_tile=512)
    knn_mod.knn_search.clear_cache()
    np.testing.assert_array_equal(np.asarray(d_one), np.asarray(d_scan))
    np.testing.assert_array_equal(np.asarray(i_one), np.asarray(i_scan))
