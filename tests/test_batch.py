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


def test_batch_tile_shrink_footprint_and_warning(rng, caplog, monkeypatch):
    """The round-5 hardware finding: vmap multiplies the distance-block
    footprint by B, and B*qt*rt at 4x the measured-safe budget faulted the
    TPU worker. The batch entry must (a) shrink tiles back inside the
    budget, (b) never halve an explicit tile below its efficiency floor,
    (c) warn on accelerators ONLY when the floors prevent reaching the
    budget — judged by ABSOLUTE footprint, not halving count (small
    explicit tiles must not warn spuriously)."""
    import dataclasses
    import logging

    from simpleicp_tpu.models import icp as icp_core

    captured = {}
    real_replace = dataclasses.replace

    def spy_replace(obj, **kw):
        if "query_tile" in kw:
            captured["qt"], captured["rt"] = kw["query_tile"], kw["ref_tile"]
        return real_replace(obj, **kw)

    monkeypatch.setattr(dataclasses, "replace", spy_replace)
    monkeypatch.setattr(icp_core.jax, "default_backend", lambda: "tpu")

    budget = icp_core._BATCH_FOOTPRINT_BUDGET
    Xf, Xm, _ = _batch(rng, B=8, n=1500)
    cfg = IcpConfig(correspondences=200, max_iterations=4)

    # (a) default tiles at B=8: shrink to within budget, no warning
    with caplog.at_level(logging.WARNING, logger="simpleicp_tpu"):
        icp_register_batch(Xf, Xm, cfg)
    assert 8 * captured["qt"] * captured["rt"] <= budget
    assert captured["qt"] >= 256 and captured["rt"] >= 1024
    assert not [r for r in caplog.records if "footprint" in r.message]

    # (b) non-power-of-two explicit tile never lands below its floor
    captured.clear()
    icp_register_batch(
        Xf, Xm, dataclasses.replace(cfg, ref_tile=1536))
    if captured:  # qt shrinks instead; rt must not go below 1024
        assert captured["rt"] >= 1024 and captured["qt"] >= 256

    # (c1) small explicit tiles, under budget: NO spurious warning
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="simpleicp_tpu"):
        icp_register_batch(
            Xf, Xm, dataclasses.replace(cfg, query_tile=256, ref_tile=1024))
    assert not [r for r in caplog.records if "footprint" in r.message]

    # (c2) floors cannot reach the budget: warning names the real ratio
    B_huge = budget // (256 * 1024) + 8  # guaranteed over budget at floors
    Xf_h = np.broadcast_to(Xf[0], (B_huge,) + Xf[0].shape)
    Xm_h = np.broadcast_to(Xm[0], (B_huge,) + Xm[0].shape)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="simpleicp_tpu"):
        icp_register_batch(
            Xf_h, Xm_h, dataclasses.replace(cfg, max_iterations=1))
    warned = [r for r in caplog.records if "footprint" in r.message]
    assert warned, "over-budget batch did not warn on the accelerator"
