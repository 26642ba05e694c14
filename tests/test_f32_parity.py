"""Bound the f32 TPU fast path against the f64 parity path.

The pipeline documents two deliberate f32-only deviations
(models/icp.py:run_icp_loop noise floor, docs/DESIGN.md §3): residual
statistics hit the dtype's rounding floor and a noise-floor early-out stops
the iteration instead of letting the purely relative min_change criterion
stall on rounding jitter. These tests make that claim executable: the same
problem registered in f32 and f64 must converge within a small iteration
delta and agree on the transform to f32-coordinate accuracy.
"""

import numpy as np
import jax.numpy as jnp

from simpleicp_tpu import IcpConfig, icp_register


def _angular_error_deg(R1, R2):
    cos = (np.trace(R1.T @ R2) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def _run(X_fix, X_mov, cfg, dtype):
    res = icp_register(X_fix, X_mov, cfg, dtype=dtype)
    assert int(res.error_code) == 0
    assert bool(res.converged)
    return res


def test_dragon_f32_matches_f64(dragon):
    X_fix, X_mov = dragon
    cfg = IcpConfig()
    r64 = _run(X_fix, X_mov, cfg, jnp.float64)
    r32 = _run(X_fix, X_mov, cfg, jnp.float32)
    n64, n32 = int(r64.n_iterations), int(r32.n_iterations)
    # Without the noise floor the f32 run stalls for tens of iterations
    # (measured 41 vs 7); with it the counts must stay close.
    assert abs(n32 - n64) <= 2, (n32, n64)
    H64, H32 = np.asarray(r64.H), np.asarray(r32.H)
    assert _angular_error_deg(H32[:3, :3], H64[:3, :3]) < 0.02
    # dragon coordinates are O(1); f32 eps * |coords| ~ 1e-7 but the
    # optimum itself is only determined to the residual noise (~1e-4).
    np.testing.assert_allclose(H32[:3, 3], H64[:3, 3], atol=2e-3)
    # converged residual spread at the same level
    s64 = float(np.asarray(r64.iter_stds)[n64 - 1])
    s32 = float(np.asarray(r32.iter_stds)[n32 - 1])
    assert s32 < 2.0 * s64 + 1e-4


def test_bunny_gated_f32_matches_f64(bunny):
    X_fix, X_mov = bunny
    cfg = IcpConfig(max_overlap_distance=1.0)
    r64 = _run(X_fix, X_mov, cfg, jnp.float64)
    r32 = _run(X_fix, X_mov, cfg, jnp.float32)
    assert abs(int(r32.n_iterations) - int(r64.n_iterations)) <= 3
    H64, H32 = np.asarray(r64.H), np.asarray(r32.H)
    assert _angular_error_deg(H32[:3, :3], H64[:3, :3]) < 0.05
    np.testing.assert_allclose(H32[:3, 3], H64[:3, 3], atol=2e-3)


# ---------------------------------------------------------------------------
# Q13 (SURVEY.md §2.9): the absolute convergence noise floor is a deliberate
# deviation from the reference's purely relative min_change criterion. These
# two tests pin its contract: (a) in f64 the floor NEVER fires — trajectories
# are bit-identical with the floor disabled, so the parity path keeps exact
# reference semantics; (b) in f32 the floor is load-bearing — without it the
# relative criterion stalls on rounding jitter for tens of iterations.
# ---------------------------------------------------------------------------

import dataclasses


def test_q13_f64_floor_is_noop(dragon, bunny):
    for clouds, base in (
        (dragon, IcpConfig()),
        (bunny, IcpConfig(max_overlap_distance=1.0)),
    ):
        X_fix, X_mov = clouds
        cfg_floor = base
        cfg_ref = dataclasses.replace(base, convergence_floor_scale=0.0)
        r_floor = _run(X_fix, X_mov, cfg_floor, jnp.float64)
        r_ref = _run(X_fix, X_mov, cfg_ref, jnp.float64)
        assert int(r_floor.n_iterations) == int(r_ref.n_iterations)
        np.testing.assert_array_equal(
            np.asarray(r_floor.H), np.asarray(r_ref.H)
        )
        np.testing.assert_array_equal(
            np.asarray(r_floor.iter_means), np.asarray(r_ref.iter_means)
        )
        np.testing.assert_array_equal(
            np.asarray(r_floor.iter_stds), np.asarray(r_ref.iter_stds)
        )


def test_q13_f32_stall_motivates_floor(dragon):
    # The stall regime: once eps(f32)·|coords| reaches the residual scale,
    # the relative criterion measures pure rounding jitter. Georeferenced
    # (UTM-scale, ~1e6 m) coordinates through the FUNCTIONAL API (which,
    # unlike SimpleICP.run's center=True, does not recenter) are the
    # documented motivation. Measured here: floor → converges in 2
    # iterations; pure relative criterion → burns all 100 max_iterations
    # without ever converging. (On TPU the same happens at dragon's native
    # O(1) scale because the solver's internal accumulations are f32 too —
    # x64-off; the 41-vs-7 README repro.)
    X_fix, X_mov = dragon
    off = np.float64(1e6)
    X_fix, X_mov = X_fix + off, X_mov + off
    r_floor = icp_register(X_fix, X_mov, IcpConfig(), dtype=jnp.float32)
    r_ref = icp_register(
        X_fix, X_mov,
        IcpConfig(convergence_floor_scale=0.0),
        dtype=jnp.float32,
    )
    assert int(r_floor.error_code) == 0 and bool(r_floor.converged)
    assert int(r_ref.error_code) == 0
    n_floor, n_ref = int(r_floor.n_iterations), int(r_ref.n_iterations)
    stalled = (not bool(r_ref.converged)) or n_ref >= 4 * n_floor
    assert stalled, (n_ref, bool(r_ref.converged), n_floor)
