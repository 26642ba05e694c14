"""Class-API surface and logging-contract tests (parity with
/root/reference/python/simpleicp/simpleicp.py + pointcloud.py)."""

import logging

import numpy as np
import pytest

from simpleicp_tpu import PointCloud, PointCloudException, SimpleICP, SimpleICPException


def _make_surface(rng, n=5000):
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.25 * np.sin(2 * xy[:, 0]) + 0.15 * np.cos(3 * xy[:, 1])
    return np.column_stack([xy, z])


# ---------------------------------------------------------------- PointCloud

def test_pointcloud_requires_xyz():
    with pytest.raises(PointCloudException):
        PointCloud({"x": np.zeros(3), "y": np.zeros(3)})


def test_pointcloud_selection_ops(rng):
    pc = PointCloud(rng.normal(size=(100, 3)))
    assert pc.num_points == 100
    assert pc.num_selected_points == 100
    pc.select_n_points(10)
    assert pc.num_selected_points == 10
    # matches reference round(linspace) semantics
    expected = np.round(np.linspace(0, 99, 10)).astype(int)
    np.testing.assert_array_equal(pc.idx_selected, expected)
    pc.select_all_points()
    pc.select_by_indices([5, 7, 200])  # out-of-selection indices are ignored
    np.testing.assert_array_equal(pc.idx_selected, [5, 7])
    pc.unselect_all_points()
    assert pc.num_selected_points == 0


def test_pointcloud_select_in_range(rng):
    pts = rng.uniform(0, 1, size=(200, 3))
    pc = PointCloud(pts)
    # reference cloud around only the first 100 points
    pc.select_in_range(pts[:100] + 1e-9, max_range=1e-3)
    assert set(pc.idx_selected) >= set(range(100))


def test_pointcloud_transform_roundtrip(rng):
    pts = rng.normal(size=(50, 3))
    pc = PointCloud(pts.copy())
    H = np.eye(4)
    H[:3, 3] = [1.0, -2.0, 3.0]
    pc.transform_by_H(H)
    np.testing.assert_allclose(pc.X, pts + [1.0, -2.0, 3.0], atol=1e-12)


def test_pointcloud_estimate_normals(rng):
    X = _make_surface(rng, 2000)
    pc = PointCloud(X)
    pc.select_n_points(100)
    pc.estimate_normals(10)
    assert {"nx", "ny", "nz", "planarity"} <= set(pc.columns)
    sel = pc.idx_selected
    norms = np.linalg.norm(
        np.column_stack([pc["nx"][sel], pc["ny"][sel], pc["nz"][sel]]), axis=1
    )
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    unsel = np.setdiff1d(np.arange(2000), sel)
    assert np.all(np.isnan(pc["planarity"][unsel]))


def test_pointcloud_write_xyz(tmp_path, rng):
    pc = PointCloud(rng.normal(size=(10, 3)))
    f = tmp_path / "out.xyz"
    pc.write_xyz(f)
    lines = f.read_text().strip().split("\n")
    assert lines[0].startswith("//X")
    assert len(lines) == 11


# ------------------------------------------------------------------ SimpleICP

def test_run_argument_validation(rng):
    icp = SimpleICP(verbose=False)
    pc = PointCloud(rng.normal(size=(100, 3)))
    icp.add_point_clouds(pc, PointCloud(rng.normal(size=(100, 3))))
    with pytest.raises(SimpleICPException):
        icp.run(distance_weights=0)
    with pytest.raises(SimpleICPException):
        icp.run(rbp_observed_values=(1.0, 2.0))
    with pytest.raises(SimpleICPException):
        icp.run(rbp_observation_weights=(1, 1, 1, 1, 1, -1))
    with pytest.raises(SimpleICPException):
        icp.run(rbp_observation_weights=(np.inf,) * 6)


def test_run_without_clouds_raises():
    with pytest.raises(SimpleICPException):
        SimpleICP(verbose=False).run()


def test_end_to_end_api(rng, caplog):
    X_fix = _make_surface(rng)
    t_true = np.array([0.05, -0.03, 0.02])
    X_mov = X_fix - t_true

    icp = SimpleICP(verbose=False)
    pc_fix, pc_mov = PointCloud(X_fix), PointCloud(X_mov.copy())
    icp.add_point_clouds(pc_fix, pc_mov)
    with caplog.at_level(logging.INFO, logger="simpleicp_tpu"):
        H, X_out, rbp, residuals = icp.run(correspondences=500, max_iterations=30)

    np.testing.assert_allclose(H[:3, 3], t_true, atol=2e-3)
    assert X_out.shape == X_mov.shape
    # pc2 was permanently transformed (reference simpleicp.py:316)
    np.testing.assert_allclose(pc_mov.X, X_out)
    np.testing.assert_allclose(np.mean(np.abs(residuals)), 0.0, atol=1e-2)
    # rbp populated
    assert np.isfinite(rbp.tx.estimated_value)
    assert np.isfinite(rbp.tx.estimated_uncertainty)
    assert rbp.alpha1.scale_for_logging == pytest.approx(180 / np.pi)

    # logging contract fragments
    text = caplog.text
    assert "Select points for correspondences in fixed point cloud ..." in text
    assert "Estimate normals of selected points ..." in text
    assert "Start iterations ..." in text
    assert "orig:0" in text
    assert "Estimated transformation matrix H:" in text
    assert "Finished in" in text


def test_observed_parameters_freeze(rng):
    X_fix = _make_surface(rng)
    X_mov = X_fix - np.array([0.05, 0.0, 0.01])
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    H, _, rbp, _ = icp.run(
        correspondences=500,
        rbp_observed_values=(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        rbp_observation_weights=(np.inf, np.inf, np.inf, 0.0, 0.0, 0.0),
    )
    # angles frozen at 0 -> pure translation estimated
    np.testing.assert_allclose(H[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(H[:3, 3], [0.05, 0.0, 0.01], atol=2e-3)
    assert np.isnan(rbp.alpha1.estimated_uncertainty)


def test_user_supplied_normals_are_honored(rng):
    # Q11: run() skips normal estimation when the columns exist
    X_fix = _make_surface(rng, 3000)
    X_mov = X_fix - np.array([0.02, 0.01, -0.01])
    pc_fix = PointCloud(X_fix)
    pc_fix.estimate_normals(10)
    pc_fix.select_all_points()
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(pc_fix, PointCloud(X_mov))
    H, _, _, _ = icp.run(correspondences=500, max_iterations=30)
    np.testing.assert_allclose(H[:3, 3], [0.02, 0.01, -0.01], atol=5e-3)


def test_debug_dirpath_dumps(tmp_path, rng):
    X_fix = _make_surface(rng, 2000)
    X_mov = X_fix - np.array([0.02, 0.0, 0.0])
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    icp.run(correspondences=200, max_iterations=10, debug_dirpath=str(tmp_path))
    files = {f.name for f in tmp_path.iterdir()}
    assert "iteration000_preoptim_pcfix.xyz" in files
    assert "iteration000_preoptim_pcmov.xyz" in files
    assert "iteration000_preoptim_correspondences.xyz" in files
    assert any("postoptim_pcmov" in f for f in files)


def test_movable_planarity_gating(rng):
    """Q5 both-cloud planarity gate: when pc2 carries a planarity column,
    correspondences matched to low-planarity movable points are rejected
    (reference corrpts.py:151-163)."""
    from simpleicp_tpu import SimpleICPException

    xy = rng.uniform(-2, 2, size=(5000, 2))
    z = 0.3 * np.sin(2 * xy[:, 0])
    X1 = np.column_stack([xy, z])
    X2 = X1 - np.array([0.02, 0.01, -0.005])

    # healthy movable planarity: same result as without the column
    pc1, pc2 = PointCloud(X1.copy()), PointCloud(X2.copy())
    pc2.estimate_normals(10)
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(pc1, pc2)
    H_gated, _, _, _ = icp.run(max_iterations=20)

    icp2 = SimpleICP(verbose=False)
    icp2.add_point_clouds(PointCloud(X1.copy()), PointCloud(X2.copy()))
    H_plain, _, _, _ = icp2.run(max_iterations=20)
    np.testing.assert_allclose(H_gated, H_plain, atol=1e-6)

    # zero movable planarity rejects every correspondence
    pc1b, pc2b = PointCloud(X1.copy()), PointCloud(X2.copy())
    pc2b.estimate_normals(10)
    pc2b["planarity"] = np.zeros(len(pc2b), dtype=np.float32)
    icp3 = SimpleICP(verbose=False)
    icp3.add_point_clouds(pc1b, pc2b)
    with pytest.raises(SimpleICPException, match="Too few correspondences"):
        icp3.run(max_iterations=5)


def test_tiny_fixed_cloud_fewer_than_correspondences(rng):
    """nf < correspondences: all fixed points become queries, masked slots
    stay inert (multisensor-style size asymmetry, but on the fixed side)."""
    n = 60
    xy = rng.uniform(-1, 1, size=(n, 2))
    # curved surface: a perfect plane leaves in-plane motion unobservable
    X1 = np.column_stack([xy, 0.2 * np.sin(2 * xy[:, 0]) + 0.1 * xy[:, 1] ** 2])
    X2 = X1 - np.array([0.02, -0.01, 0.005])
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X1), PointCloud(X2))
    H, _, _, residuals = icp.run(neighbors=5, max_iterations=30)
    np.testing.assert_allclose(H[:3, 3], [0.02, -0.01, 0.005], atol=1e-3)
    assert len(residuals) <= n


def test_metrics_module(rng):
    from simpleicp_tpu.metrics import chamfer_distance, nn_rmse, rotation_angle_deg

    X = rng.uniform(-1, 1, (2000, 3))
    assert nn_rmse(X, X) == 0.0
    assert chamfer_distance(X, X) == 0.0
    shifted = X + 0.001
    assert 0 < nn_rmse(shifted, X) < 0.01
    R = np.eye(3)
    assert rotation_angle_deg(R, R) == 0.0
    a = np.deg2rad(5.0)
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    np.testing.assert_allclose(rotation_angle_deg(R, Rz), 5.0, atol=1e-9)
