"""Batched registration (vmap over the full pipeline) vs serial runs."""

import numpy as np
import pytest

from simpleicp_tpu import IcpConfig
from simpleicp_tpu.models.icp import icp_register, icp_register_batch


def _batch(rng, B=3, n=3000):
    Xf = np.stack([
        np.column_stack([
            rng.uniform(-2, 2, (n, 2)),
            0.2 * np.sin(3 * rng.uniform(-2, 2, n)),
        ])
        for _ in range(B)
    ])
    ts = rng.uniform(-0.05, 0.05, (B, 3))
    return Xf, Xf - ts[:, None, :], ts


def test_batch_matches_serial(rng):
    Xf, Xm, _ = _batch(rng)
    cfg = IcpConfig(correspondences=300, max_iterations=30)
    res_b = icp_register_batch(Xf, Xm, cfg)
    assert res_b.H.shape == (3, 4, 4)
    for i in range(Xf.shape[0]):
        r = icp_register(Xf[i], Xm[i], cfg)
        np.testing.assert_allclose(
            np.asarray(res_b.H)[i], np.asarray(r.H), atol=1e-10
        )
        assert int(res_b.n_iterations[i]) == int(r.n_iterations)


def test_batch_recovers_transforms(rng):
    Xf, Xm, ts = _batch(rng, B=4)
    res = icp_register_batch(Xf, Xm, IcpConfig(correspondences=300))
    assert np.all(np.asarray(res.error_code) == 0)
    np.testing.assert_allclose(
        np.asarray(res.H)[:, :3, 3], ts, atol=5e-3
    )


def test_batch_with_gate_and_observations(rng):
    Xf, Xm, _ = _batch(rng, B=2)
    obs = np.zeros((2, 6))
    w = np.zeros((2, 6))
    w[:, 0] = np.inf  # freeze alpha1 at 0 in both pairs
    res = icp_register_batch(
        Xf, Xm, IcpConfig(correspondences=200, max_overlap_distance=1.0),
        rbp_observed_values=obs, rbp_observation_weights=w,
    )
    assert np.all(np.asarray(res.error_code) == 0)
    np.testing.assert_allclose(np.asarray(res.p)[:, 0], 0.0, atol=1e-12)
    assert np.all(np.isnan(np.asarray(res.uncertainties)[:, 0]))


def test_batch_shape_validation(rng):
    with pytest.raises(ValueError, match=r"\(B, n, 3\)"):
        icp_register_batch(rng.uniform(size=(10, 3)), rng.uniform(size=(10, 3)))
    with pytest.raises(ValueError, match="grid"):
        icp_register_batch(
            rng.uniform(size=(1, 10, 3)), rng.uniform(size=(1, 10, 3)),
            IcpConfig(max_overlap_distance=1.0, gate_method="grid"),
        )
