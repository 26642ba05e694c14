"""Pallas NN kernel vs the lax kernel and scipy cKDTree (interpreter mode —
the real-TPU compile path is exercised by the driver's compile check and the
benchmark harness)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax.numpy as jnp

from simpleicp_tpu.ops.knn import nn_search
from simpleicp_tpu.ops.knn_pallas import nn_search_pallas


def test_pallas_nn_matches_kdtree(rng):
    q = rng.uniform(-10, 20, (1003, 3)).astype(np.float32)
    r = rng.uniform(-10, 20, (4777, 3)).astype(np.float32)
    d2, idx = nn_search_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
    dd, ii = cKDTree(r).query(q)
    np.testing.assert_array_equal(np.asarray(idx), ii)
    np.testing.assert_allclose(
        np.asarray(d2), dd.astype(np.float32) ** 2, rtol=1e-4
    )


def test_pallas_nn_ref_mask(rng):
    q = rng.uniform(0, 1, (257, 3)).astype(np.float32)
    r = rng.uniform(0, 1, (2100, 3)).astype(np.float32)
    mask = np.zeros(len(r), bool)
    mask[::3] = True
    d2, idx = nn_search_pallas(
        jnp.asarray(q), jnp.asarray(r), ref_mask=jnp.asarray(mask),
        interpret=True,
    )
    dd, ii = cKDTree(r[mask]).query(q)
    np.testing.assert_array_equal(np.flatnonzero(mask)[ii], np.asarray(idx))


def test_pallas_bit_identical_to_lax(rng):
    """Same exact distances and first-minimum tie-breaking as ops/knn."""
    q = rng.uniform(-5, 5, (600, 3)).astype(np.float32)
    r = rng.uniform(-5, 5, (3000, 3)).astype(np.float32)
    d2p, idxp = nn_search_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
    d2l, idxl = nn_search(jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(idxp), np.asarray(idxl))
    np.testing.assert_array_equal(np.asarray(d2p), np.asarray(d2l))


@pytest.mark.parametrize("nq,nr", [(1, 1), (7, 130), (512, 2048)])
def test_pallas_odd_shapes(rng, nq, nr):
    q = rng.uniform(0, 1, (nq, 3)).astype(np.float32)
    r = rng.uniform(0, 1, (nr, 3)).astype(np.float32)
    d2, idx = nn_search_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
    dd, ii = cKDTree(r).query(q)
    np.testing.assert_array_equal(np.asarray(idx), ii)


@pytest.mark.parametrize("k", [1, 10, 40])
def test_pallas_knn_matches_kdtree(rng, k):
    q = rng.uniform(-10, 20, (700, 3)).astype(np.float32)
    r = rng.uniform(-10, 20, (5000, 3)).astype(np.float32)
    from simpleicp_tpu.ops.knn_pallas import knn_search_pallas

    d2, idx = knn_search_pallas(jnp.asarray(q), jnp.asarray(r), k, interpret=True)
    dd, ii = cKDTree(r).query(q, k=k)
    if k == 1:
        dd, ii = dd[:, None], ii[:, None]
    np.testing.assert_array_equal(np.asarray(idx), ii)
    np.testing.assert_allclose(np.asarray(d2), dd.astype(np.float32) ** 2, rtol=1e-4)


def test_pallas_knn_ref_mask(rng):
    from simpleicp_tpu.ops.knn_pallas import knn_search_pallas

    q = rng.uniform(0, 1, (130, 3)).astype(np.float32)
    r = rng.uniform(0, 1, (3000, 3)).astype(np.float32)
    mask = np.zeros(len(r), bool)
    mask[::2] = True
    d2, idx = knn_search_pallas(
        jnp.asarray(q), jnp.asarray(r), 5, ref_mask=jnp.asarray(mask),
        interpret=True,
    )
    dd, ii = cKDTree(r[mask]).query(q, k=5)
    np.testing.assert_array_equal(np.flatnonzero(mask)[ii], np.asarray(idx))


def test_match_transform_pallas_vs_kdtree(rng):
    """Fused transform+match kernel == KD-tree query of the moved cloud."""
    from simpleicp_tpu.ops.knn_pallas import (
        match_transform_pallas, pad_ref_planes,
    )
    from simpleicp_tpu.ops.transform import apply_H, rbp_to_H

    q = rng.uniform(-5, 5, (1000, 3))
    r = rng.uniform(-5, 5, (9100, 3))
    H = np.asarray(rbp_to_H(jnp.asarray([0.03, -0.02, 0.1, 0.4, -0.2, 0.05])))
    planes = pad_ref_planes(jnp.asarray(r), ref_tile=2048)
    d2, idx = match_transform_pallas(
        jnp.asarray(q), planes, jnp.asarray(H), ref_tile=2048, interpret=True
    )
    moved = np.asarray(apply_H(jnp.asarray(r), jnp.asarray(H)))
    dd, ii = cKDTree(moved).query(q)
    np.testing.assert_array_equal(np.asarray(idx), ii)
    np.testing.assert_allclose(np.asarray(d2), dd**2, rtol=1e-10)
