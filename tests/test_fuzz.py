"""Configuration fuzz: random small clouds x random valid configs must
never produce NaN transforms or crash — they either converge, hit
max_iterations, or surface a defined error code."""

import numpy as np
import pytest

from simpleicp_tpu import IcpConfig
from simpleicp_tpu.models.icp import ERR_OK, icp_register


@pytest.mark.parametrize("seed", range(8))
def test_random_config_never_nan(seed):
    rng = np.random.default_rng(1000 + seed)
    n1 = int(rng.integers(40, 800))
    n2 = int(rng.integers(40, 800))
    xy = rng.uniform(-2, 2, size=(n1, 2))
    X1 = np.column_stack([xy, 0.3 * np.sin(2 * xy[:, 0]) + 0.1 * xy[:, 1] ** 2])
    xy2 = rng.uniform(-2, 2, size=(n2, 2))
    X2 = np.column_stack(
        [xy2, 0.3 * np.sin(2 * xy2[:, 0]) + 0.1 * xy2[:, 1] ** 2]
    ) - rng.uniform(-0.1, 0.1, 3)

    gated = rng.random() < 0.5
    cfg = IcpConfig(
        correspondences=int(rng.integers(6, 200)),
        neighbors=int(rng.integers(3, min(9, n1))),
        min_planarity=float(rng.uniform(0.0, 0.6)),
        max_overlap_distance=(
            float(rng.uniform(0.3, 2.0)) if gated else np.inf
        ),
        min_change=float(rng.uniform(0.1, 5.0)),
        max_iterations=int(rng.integers(1, 25)),
        distance_weights=(None if rng.random() < 0.3
                          else float(rng.uniform(0.1, 10.0))),
        mad_scale=float(rng.choice([1.0, 1.4826])),
        solver=str(rng.choice(["nonlinear", "linearized"])),
        gate_method=str(rng.choice(["auto", "brute", "grid", "dilate"])),
        # radius-bounded grid matcher: needs a radius source (gate or
        # explicit); may legitimately drop out-of-radius correspondences
        match_method=str(rng.choice(["brute", "grid"])) if gated else "brute",
    )
    obs = rng.uniform(-0.05, 0.05, 6)
    w = np.zeros(6)
    if rng.random() < 0.4:
        w[rng.integers(0, 6)] = rng.choice([0.5, np.inf])

    res = icp_register(
        X1, X2, cfg, rbp_observed_values=obs, rbp_observation_weights=w
    )
    err = int(res.error_code)
    H = np.asarray(res.H)
    if err == ERR_OK:
        assert np.all(np.isfinite(H)), f"non-finite H for seed {seed}: {cfg}"
        p = np.asarray(res.p)
        assert np.all(np.isfinite(p)), f"non-finite p for seed {seed}"
    # any defined error code is acceptable; crashes/NaN are not
