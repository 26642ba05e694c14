"""Closed-form 3x3 eigendecomposition + normal estimation vs numpy.linalg."""

import numpy as np

from simpleicp_tpu.ops.normals import eigh3x3, estimate_normals_from_neighborhoods


def test_eigh3x3_matches_numpy(rng):
    A = rng.normal(size=(500, 3, 3))
    C = A @ np.transpose(A, (0, 2, 1))  # SPD
    vals, vmin = eigh3x3(C)
    vals = np.asarray(vals)
    vmin = np.asarray(vmin)
    ref_vals = np.linalg.eigvalsh(C)[:, ::-1]  # descending
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-8, atol=1e-10)
    # vmin is the smallest-eigenvalue eigenvector: C v = lambda_min v
    Cv = np.einsum("nij,nj->ni", C, vmin)
    lv = ref_vals[:, 2:3] * vmin
    np.testing.assert_allclose(Cv, lv, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(vmin, axis=1), 1.0, rtol=1e-10)


def test_eigh3x3_degenerate_isotropic():
    C = np.broadcast_to(np.eye(3), (4, 3, 3)).copy()
    vals, vmin = eigh3x3(C)
    np.testing.assert_allclose(np.asarray(vals), 1.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vmin), axis=1), 1.0)


def test_normal_of_plane(rng):
    # Points on the plane z = 0.3x - 0.2y + 1 -> normal ∝ (-0.3, 0.2, 1)
    xy = rng.normal(size=(50, 10, 2))
    z = 0.3 * xy[..., 0] - 0.2 * xy[..., 1] + 1.0
    neigh = np.concatenate([xy, z[..., None]], axis=-1)
    normals, planarity, _ = estimate_normals_from_neighborhoods(neigh)
    expected = np.array([-0.3, 0.2, 1.0])
    expected /= np.linalg.norm(expected)
    dots = np.abs(np.asarray(normals) @ expected)
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)
    # exactly planar neighborhoods: lambda_min ~ 0, so planarity equals
    # lambda_mid/lambda_max (positive; magnitude depends on xy anisotropy)
    _, _, eigvals = estimate_normals_from_neighborhoods(neigh)
    eigvals = np.asarray(eigvals)
    np.testing.assert_allclose(eigvals[:, 2], 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(planarity), eigvals[:, 1] / eigvals[:, 0], atol=1e-10
    )


def test_planarity_matches_reference_definition(rng):
    # planarity = (lambda_mid - lambda_min) / lambda_max with unbiased cov
    # (/root/reference/python/simpleicp/pointcloud.py:190-198)
    neigh = rng.normal(size=(20, 10, 3))
    _, planarity, _ = estimate_normals_from_neighborhoods(neigh)
    for i in range(20):
        C = np.cov(neigh[i].T, bias=False)
        ev = np.sort(np.linalg.eigvalsh(C))[::-1]
        expected = (ev[1] - ev[2]) / ev[0]
        np.testing.assert_allclose(planarity[i], expected, rtol=1e-6)
