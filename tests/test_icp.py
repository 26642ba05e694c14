"""End-to-end registration tests against the reference's recorded oracles.

Oracles (BASELINE.md):
  * Dragon final H from the reference C++ run (/root/reference/README.md:158-162).
  * Bunny final H from the reference Python run (~10 deg rotation about z).
  * Rust test oracle: converged before max_iterations and
    |mean_residual_last| < |mean_residual_first|
    (/root/reference/rust/tests/integration.rs:13-47).
"""

import numpy as np
import pytest

from simpleicp_tpu import IcpConfig, icp_register
from simpleicp_tpu.models import icp as icp_core

DRAGON_H_REF = np.array(
    [
        [0.998696, 0.052621, -0.034179, -0.206737],
        [-0.052090, 0.999028, 0.020119, -0.408088],
        [0.034822, -0.018663, 0.999436, -0.593361],
        [0.0, 0.0, 0.0, 1.0],
    ]
)

BUNNY_H_REF = np.array(
    [
        [0.984798, -0.173702, -0.000053, 0.000676],
        [0.173702, 0.984798, 0.000084, -0.001150],
        [0.000038, -0.000092, 1.000000, 0.000113],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def _angular_error_deg(R1, R2):
    cos = (np.trace(R1.T @ R2) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def _nn_rmse(H, X_mov, X_fix, step=20):
    """Post-registration NN-RMSE of a movable subsample — the
    implementation-independent quality metric (the reference oracles are
    themselves early-stopped, so parameter-exact comparison is meaningless
    beyond the convergence basin)."""
    from simpleicp_tpu.ops.knn import nn_search

    sub = X_mov[::step]
    Xt = sub @ H[:3, :3].T + H[:3, 3]
    d2, _ = nn_search(Xt, X_fix)
    return float(np.sqrt(np.mean(np.asarray(d2))))


@pytest.mark.parametrize("solver", ["nonlinear", "linearized"])
def test_dragon_registration(dragon, solver):
    X_fix, X_mov = dragon
    cfg = IcpConfig(solver=solver)
    res = icp_register(X_fix, X_mov, cfg)
    assert int(res.error_code) == icp_core.ERR_OK
    assert bool(res.converged)
    n = int(res.n_iterations)
    assert n < cfg.max_iterations
    H = np.asarray(res.H)
    # same convergence basin as the reference C++ oracle ...
    assert _angular_error_deg(H[:3, :3], DRAGON_H_REF[:3, :3]) < 0.5
    np.testing.assert_allclose(H[:3, 3], DRAGON_H_REF[:3, 3], atol=2e-2)
    # ... and at least as good an alignment as the oracle's H
    assert _nn_rmse(H, X_mov, X_fix) <= _nn_rmse(DRAGON_H_REF, X_mov, X_fix)
    # Rust-style oracle: residual spread shrinks
    stds = np.asarray(res.iter_stds)[:n]
    assert stds[-1] < np.asarray(res.orig_std)
    assert abs(np.asarray(res.iter_means)[n - 1]) < abs(np.asarray(res.orig_mean)) + 1e-9


def test_bunny_partial_overlap(bunny):
    X_fix, X_mov = bunny
    cfg = IcpConfig(max_overlap_distance=1.0)
    res = icp_register(X_fix, X_mov, cfg)
    assert int(res.error_code) == icp_core.ERR_OK
    assert bool(res.converged)
    H = np.asarray(res.H)
    assert _angular_error_deg(H[:3, :3], BUNNY_H_REF[:3, :3]) < 0.5
    np.testing.assert_allclose(H[:3, 3], BUNNY_H_REF[:3, 3], atol=2e-2)
    assert _nn_rmse(H, X_mov, X_fix, step=5) <= 1.05 * _nn_rmse(
        BUNNY_H_REF, X_mov, X_fix, step=5
    )


def test_bunny_no_overlap_raises_flag(bunny):
    X_fix, X_mov = bunny
    # Shift the movable cloud far away: nothing within the gate radius
    res = icp_register(X_fix, X_mov + 1000.0, IcpConfig(max_overlap_distance=1.0))
    assert int(res.error_code) == icp_core.ERR_NO_OVERLAP


def test_synthetic_known_transform(rng):
    # Random smooth surface, known rigid motion: recover it
    n = 20000
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    X_fix = np.column_stack([xy, z])
    a = np.array([0.02, -0.015, 0.03])
    t = np.array([0.05, -0.04, 0.03])
    c1, s1, c2, s2, c3, s3 = (
        np.cos(a[0]), np.sin(a[0]), np.cos(a[1]), np.sin(a[1]),
        np.cos(a[2]), np.sin(a[2]),
    )
    R = np.array(
        [
            [c2 * c3, -c2 * s3, s2],
            [c1 * s3 + s1 * s2 * c3, c1 * c3 - s1 * s2 * s3, -s1 * c2],
            [s1 * s3 - c1 * s2 * c3, s1 * c3 + c1 * s2 * s3, c1 * c2],
        ]
    )
    # movable = inverse-transformed fixed: ICP must estimate (R, t)
    X_mov = (X_fix - t) @ R
    res = icp_register(X_fix, X_mov, IcpConfig())
    H = np.asarray(res.H)
    assert _angular_error_deg(H[:3, :3], R) < 0.05
    np.testing.assert_allclose(H[:3, 3], t, atol=2e-3)


def test_frozen_parameters_stay_frozen(dragon):
    X_fix, X_mov = dragon
    obs_vals = np.array([0.01, 0.02, 0.0, 0.0, 0.0, 0.0])
    obs_w = np.array([np.inf, np.inf, 0.0, 0.0, 0.0, 0.0])
    res = icp_register(
        X_fix, X_mov, IcpConfig(),
        rbp_observed_values=obs_vals, rbp_observation_weights=obs_w,
    )
    p = np.asarray(res.p)
    np.testing.assert_allclose(p[0], 0.01, atol=1e-12)
    np.testing.assert_allclose(p[1], 0.02, atol=1e-12)
    unc = np.asarray(res.uncertainties)
    assert np.isnan(unc[0]) and np.isnan(unc[1])
    assert np.all(np.isfinite(unc[2:]))


def test_too_few_correspondences_flag(rng):
    # planarity gate rejects everything -> too-few error
    X = rng.normal(size=(500, 3))  # isotropic noise: planarity ~ 0.3-ish
    res = icp_register(X, X + 0.01, IcpConfig(min_planarity=0.999, correspondences=100))
    assert int(res.error_code) == icp_core.ERR_TOO_FEW_CORRESPONDENCES


def test_degenerate_plane_no_nan(rng):
    """A perfectly planar cloud leaves in-plane motion unobservable
    (rank-deficient J^T J). The damped solver must stay finite and still
    recover the observable out-of-plane offset, like the reference's SVD /
    lmfit pseudo-inverse behavior."""
    xy = rng.uniform(-1, 1, size=(2000, 2))
    X1 = np.column_stack([xy, 0.1 * xy[:, 0]])  # exact plane
    X2 = X1 - np.array([0.0, 0.0, 0.02])
    res = icp_register(X1, X2, IcpConfig(correspondences=200, max_iterations=20))
    H = np.asarray(res.H)
    assert np.all(np.isfinite(H))
    assert int(res.error_code) == 0
    # out-of-plane alignment achieved: residual p2plane distances ~ 0
    mask = np.asarray(res.residual_mask)
    assert np.abs(np.asarray(res.residuals)[mask]).max() < 1e-4


def test_select_n_gated_matches_reference_formula(rng):
    """The on-device fixed-count selection (gate path, _select_n) must pick
    exactly round(linspace(0, n_sel-1, C)) positions among the selected
    indices, like /root/reference/python/simpleicp/pointcloud.py:141-147."""
    import jax.numpy as jnp

    from simpleicp_tpu.models.icp import _select_n

    for nf, n_sel, C in [(5000, 3777, 500), (1000, 1000, 1000),
                         (997, 450, 1000), (64, 64, 16)]:
        mask = np.zeros(nf, bool)
        sel = np.sort(rng.choice(nf, size=n_sel, replace=False))
        mask[sel] = True
        idx, valid = _select_n(jnp.asarray(mask), C)
        idx, valid = np.asarray(idx), np.asarray(valid)
        if n_sel > C:
            ref = sel[np.round(np.linspace(0, n_sel - 1, C)).astype(int)]
            assert valid.all()
            np.testing.assert_array_equal(idx, ref)
        else:
            assert valid.sum() == n_sel
            np.testing.assert_array_equal(np.sort(idx[valid]), sel)


def test_select_n_gated_matches_reference_formula_at_scale():
    """At n_sel >= 2e7 an f32 linspace would deviate from the reference
    round(linspace) formula (f32 eps * span > 0.5); the integer-exact
    _select_n must not. Covers several (span, C) shapes incl. even divisors
    where round-half-to-even ties can occur."""
    import jax.numpy as jnp

    from simpleicp_tpu.models.icp import _select_n

    for n_sel, C in [
        (27_654_321, 1000),
        (20_000_001, 1000),
        (33_554_432, 497),   # even divisor (C-1=496): exercises tie handling
        (19_999_999, 1024),
    ]:
        nf = n_sel + 11
        mask = np.zeros(nf, bool)
        mask[:n_sel] = True  # contiguous prefix: selected index == position
        idx, valid = _select_n(jnp.asarray(mask), C)
        ref = np.round(np.linspace(0, n_sel - 1, C)).astype(np.int64)
        assert np.asarray(valid).all()
        np.testing.assert_array_equal(np.asarray(idx, np.int64), ref)


def test_round_linspace_bit_equality_sweep():
    """round_linspace must be BIT-equal to np.round(np.linspace(0, n_sel-1,
    C)) — including numpy's float64 artifacts at exact-half ties — across
    the (C, n_sel) grid of the round-2 verdict, in pure int32 arithmetic
    (no x64 dependence). Includes the C=60000 x n_sel=48_059_199 repro
    where the round-2 code returned 24 207 wrong indices (int32 overflow
    of seq*s_r), and tie-heavy pairs where exact-rational rounding differs
    from numpy's fl(i*fl(span/div))."""
    import jax
    import jax.numpy as jnp

    from simpleicp_tpu.models.icp import round_linspace

    cases = [
        # the verdict's numerically-verified failures
        (60_000, 48_059_199),
        (100_000, 100_100_100),
        # verdict sweep corners
        (1000, 1_000_000),
        (1000, 100_000_000),
        (100_000, 1_000_000),
        (100_000, 100_000_000),
        # numpy-vs-exact-rational tie cases (model-check mismatch list):
        # exact half-integer rationals where numpy's two float roundings
        # disagree with exact round-half-even
        (79_133, 1_000_000),
        (79_133, 2_636_235),
        (75_395, 100_000_000),
        (76_215, 100_000_000),
        (105_361, 1_000_007),
        (1567, 33_554_432),
        (4909, 98_102_698),
        # even divisors / powers of two
        (1024, 33_554_432),
        (4097, 2**27 + 13),
        (65_536, 2**30 + 1),
        # extended proof domain (round-5): 2^20+1 < C <= 2^22, valid while
        # (n_sel-1)*(C-1) < 2^51. Constructed tie-heavy cases put an exact
        # half at every odd slot (div even, span = div/2 mod div) — >1M
        # exact ties per sweep exercising the numpy-tie emulation at the
        # top of the domain.
        (2**21, 100_000_000),
        (2**22, 99_999_999),
        (2**21 + 1, 99_614_721),   # 1_048_576 exact ties (span=47.5*div)
        (2**22 - 1, 98_566_098),   # 2_097_151 exact ties (span=23.5*div)
    ]
    rng = np.random.default_rng(123)
    for _ in range(10):
        cases.append(
            (int(rng.integers(1000, 150_001)), int(rng.integers(10**6, 10**8)))
        )
    fn = jax.jit(round_linspace, static_argnums=1)
    for C, n_sel in cases:
        got = np.asarray(fn(jnp.int32(n_sel), C), np.int64)
        ref = np.round(np.linspace(0, n_sel - 1, C)).astype(np.int64)
        np.testing.assert_array_equal(got, ref, err_msg=f"C={C} n_sel={n_sel}")


def test_round_linspace_domain_enforced():
    """No silently-unproven selection configuration may exist (round-4
    verdict): IcpConfig rejects correspondences beyond the proof's 2^22
    ceiling, and the dispatch-time guard rejects extended-domain C whose
    (nf-1)*(C-1) product leaves the non-tie rounding envelope (2^51)."""
    import pytest

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models.icp import _check_round_linspace_domain

    with pytest.raises(ValueError, match="2\\*\\*22"):
        IcpConfig(correspondences=2**22 + 1)
    IcpConfig(correspondences=2**22)  # top of domain is valid

    # C <= 2^20+1: any int32 cloud size is proven — no raise even at 2^31-ish
    _check_round_linspace_domain(2**20 + 1, 2**31 - 1)
    # extended domain: fine while (nf-1)*(C-1) < 2^51 ...
    _check_round_linspace_domain(2**22, 2**29)  # (2^29-1)*(2^22-1) < 2^51
    # ... rejected past the boundary ((2^29+199)*(2^22-1) > 2^51)
    with pytest.raises(ValueError, match="proven bit-exactness"):
        _check_round_linspace_domain(2**22, 2**29 + 200)


def test_select_n_big_c_overflow_regression(rng):
    """C > 46341 makes seq*s_r overflow int32 (n*(n-1) > 2^31) — the round-2
    bug. End-to-end _select_n at such C must still pick the exact reference
    positions among a random selected subset."""
    import jax.numpy as jnp

    from simpleicp_tpu.models.icp import _select_n

    nf, n_sel, C = 5_000_000, 3_987_654, 60_000
    mask = np.zeros(nf, bool)
    sel = np.sort(rng.choice(nf, size=n_sel, replace=False))
    mask[sel] = True
    idx, valid = _select_n(jnp.asarray(mask), C)
    ref = sel[np.round(np.linspace(0, n_sel - 1, C)).astype(np.int64)]
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(idx, np.int64), ref)


def test_zeros_const_cache_reuse_and_isolation():
    """Round-4 small-path: the dummy/zero device constants are cached per
    (shape, dtype, backend) and reused across registrations (each jnp.zeros
    is otherwise a separate tiny device program per run — milliseconds of
    tunnel latency each on a ~30 ms job). The arrays must be identical
    objects across calls, never donated/deleted, and distinct per dtype."""
    import jax.numpy as jnp

    from simpleicp_tpu.models import icp as icp_core

    a = icp_core._zeros_const((6,), jnp.float32)
    b = icp_core._zeros_const((6,), jnp.float32)
    assert a is b
    c = icp_core._zeros_const((6,), jnp.float64)
    assert c is not a and c.dtype == jnp.float64
    # still alive and usable after a full registration ran with them
    rng = np.random.default_rng(3)
    X = rng.standard_normal((500, 3))
    res = icp_register(X, X + 1e-3, IcpConfig(correspondences=100))
    assert int(res.error_code) == 0
    np.testing.assert_array_equal(np.asarray(a), np.zeros(6, np.float32))
