"""The remaining reference test-suite configurations
(/root/reference/python/simpleicp/tests/test_simpleicp.py:35-104):
multisensor lidar<->radar with frozen angle observations, and webots with a
pure initial-guess observation (zero weights). Reference tests are smoke
tests (no value asserts); we additionally assert convergence behavior and
observation semantics."""

import os

import numpy as np
import pytest

from simpleicp_tpu import PointCloud, SimpleICP
from simpleicp_tpu.utils.xyz_io import read_xyz

DATA = "/root/reference/data"


def test_multisensor_frozen_angles(multisensor):
    """max_overlap_distance=1, alpha1 frozen at -0.5 deg, alpha2 frozen at 0
    (test_simpleicp.py:73-85)."""
    X_fix, X_mov = multisensor
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    H, X_out, rbp, residuals = icp.run(
        max_overlap_distance=1.0,
        rbp_observed_values=(-0.5, 0.0, 0.0, 0.0, 0.0, 0.0),
        rbp_observation_weights=(np.inf, np.inf, 0.0, 0.0, 0.0, 0.0),
    )
    # frozen angles hold exactly (lmfit vary=False semantics)
    np.testing.assert_allclose(
        rbp.alpha1.estimated_value, np.deg2rad(-0.5), atol=1e-12
    )
    np.testing.assert_allclose(rbp.alpha2.estimated_value, 0.0, atol=1e-12)
    assert np.isnan(rbp.alpha1.estimated_uncertainty)
    assert np.isfinite(rbp.alpha3.estimated_uncertainty)
    assert np.std(residuals) < 1.0


def test_webots_initial_guess():
    """neighbors=40, max_overlap_distance=0.5, observed initial values
    (0,0,-60deg,-0.05,-0.09,0) with all-zero weights — a pure initial guess
    (test_simpleicp.py:86-97). Exercises SURVEY.md Q10: the initial H applies
    before the overlap gate."""
    X_fix = read_xyz(os.path.join(DATA, "webots1.xyz"))
    X_mov = read_xyz(os.path.join(DATA, "webots2.xyz"))
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    H, _, rbp, residuals = icp.run(
        neighbors=40,
        max_overlap_distance=0.5,
        rbp_observed_values=(0.0, 0.0, -60.0, -0.05, -0.09, 0.0),
        rbp_observation_weights=(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    )
    # the registration stays in the initial-guess basin (~ -60 deg about z)
    assert abs(rbp.alpha3.estimated_value_scaled + 60.0) < 10.0
    assert np.std(residuals) < 0.1


@pytest.mark.slow
def test_dragon_api_end_to_end(dragon):
    """Full dragon through the class API (reference test config #1)."""
    X_fix, X_mov = dragon
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X_fix), PointCloud(X_mov))
    H, X_out, rbp, residuals = icp.run()
    assert np.std(residuals) < 0.01
    # movable point cloud was transformed by H
    np.testing.assert_allclose(
        X_out, X_mov @ np.asarray(H)[:3, :3].T + np.asarray(H)[:3, 3], atol=1e-9
    )
