"""CorrPts interactive correspondence engine (API parity with
/root/reference/python/simpleicp/corrpts.py) and profiling utils."""

import numpy as np
import pytest

from simpleicp_tpu import CorrPts, CorrPtsException, PointCloud


def _plane_clouds(rng, n=4000):
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.1 * xy[:, 0] + 0.05 * xy[:, 1]
    X1 = np.column_stack([xy, z])
    X2 = X1 + np.array([0.01, -0.02, 0.005])
    return PointCloud(X1), PointCloud(X2)


def test_corrpts_match_and_distances(rng):
    pc1, pc2 = _plane_clouds(rng)
    pc1.estimate_normals(10)
    cp = CorrPts(pc1, pc2)
    cp.match()
    assert cp.num_corr_pts == len(pc1)
    assert cp.point_to_plane_distances is not None
    # oracle: distances = (x2 - x1) . n1 per matched pair
    d_ref = np.einsum("ij,ij->i", cp.X2 - cp.X1, cp.normals1)
    np.testing.assert_allclose(cp.point_to_plane_distances, d_ref, atol=1e-12)


def test_corrpts_rejections(rng):
    pc1, pc2 = _plane_clouds(rng)
    pc1.estimate_normals(10)
    cp = CorrPts(pc1, pc2)
    cp.match()
    n0 = cp.num_corr_pts
    cp.reject_wrt_planarity(0.3)
    assert 0 < cp.num_corr_pts <= n0
    # give distances a healthy spread, inject one gross outlier: only it
    # should fall outside the 3-sigma MAD band
    cp.point_to_plane_distances = rng.normal(0.0, 0.01, cp.num_corr_pts)
    cp.point_to_plane_distances[0] = 100.0
    n1 = cp.num_corr_pts
    cp.reject_wrt_point_to_plane_distances()
    assert cp.num_corr_pts < n1
    assert np.all(np.abs(cp.point_to_plane_distances) < 1.0)


def test_corrpts_errors_and_unimplemented(rng):
    pc1, pc2 = _plane_clouds(rng)
    cp = CorrPts(pc1, pc2)
    with pytest.raises(CorrPtsException):
        cp.reject_wrt_planarity(0.3)
    with pytest.raises(NotImplementedError):
        cp.reject_wrt_to_angle_between_normals()


def test_corrpts_angle_rejection_extension(rng):
    """Zero-arg call keeps reference parity (NotImplementedError); passing
    max_angle_deg runs the TPU-build extension: reject pairs whose normals
    (as unoriented lines) differ by more than the threshold."""
    pc1, pc2 = _plane_clouds(rng)
    pc1.estimate_normals(10)
    # pc2 normals: half the cloud copies pc1's plane normal, the other half
    # is corrupted to a near-orthogonal direction
    pc2.estimate_normals(10)
    n = len(pc2)
    bad = np.zeros(n, bool)
    bad[: n // 2] = True
    for c, v in zip(("nx", "ny", "nz"), (1.0, 0.0, 0.0)):
        col = np.asarray(pc2[c]).copy()
        col[bad] = v  # x-axis: ~86 deg from the plane normal (~[ -0.1, -0.05, 1 ])
        pc2[c] = col
    cp = CorrPts(pc1, pc2)
    cp.match()
    matched_bad = bad[cp.idx_pc2]
    n_good = int((~matched_bad).sum())
    cp.reject_wrt_to_angle_between_normals(max_angle_deg=30.0)
    assert cp.num_corr_pts == n_good
    # sign flips must NOT reject (normal orientation is arbitrary)
    pc2_f = PointCloud(pc2.X)
    pc2_f.estimate_normals(10)
    for c in ("nx", "ny", "nz"):
        pc2_f[c] = -np.asarray(pc2_f[c])
    cp2 = CorrPts(pc1, pc2_f)
    cp2.match()
    n0 = cp2.num_corr_pts
    cp2.reject_wrt_to_angle_between_normals(max_angle_deg=30.0)
    assert cp2.num_corr_pts == n0
    # missing normals on either side -> CorrPtsException
    cp3 = CorrPts(pc1, PointCloud(pc2.X))
    cp3.match()
    with pytest.raises(CorrPtsException, match="pc2 has no normals"):
        cp3.reject_wrt_to_angle_between_normals(max_angle_deg=30.0)


def test_corrpts_write_xyz(tmp_path, rng):
    pc1, pc2 = _plane_clouds(rng, n=500)
    pc1.estimate_normals(10)
    cp = CorrPts(pc1, pc2)
    cp.match()
    path = tmp_path / "corr.xyz"
    cp.write_xyz(path)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("//")
    assert len(lines) == cp.num_corr_pts + 1


def test_stage_timer():
    from simpleicp_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    out = t.report()
    assert set(out) == {"a", "b"} and all(v >= 0 for v in out.values())


def test_homogeneous_roundtrip(rng):
    import jax.numpy as jnp

    from simpleicp_tpu.ops.transform import (
        euler_coord_to_homogeneous_coord,
        homogeneous_coord_to_euler_coord,
    )

    X = rng.standard_normal((100, 3))
    Xh = euler_coord_to_homogeneous_coord(jnp.asarray(X))
    assert Xh.shape == (100, 4)
    np.testing.assert_allclose(
        np.asarray(homogeneous_coord_to_euler_coord(Xh)), X, atol=1e-12
    )
