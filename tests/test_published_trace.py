"""Pin the pipeline against the reference's PUBLISHED C++ dragon output
(/root/reference/README.md:140-164): the convergence trace and the final H.

Scope discovered in round 3 (scripts/diag_eigensign.py): the published
per-iteration counts / means / stds are NOT invariants of the algorithm —
they depend on the eigenvector SIGN pattern of the normal estimation, which
differs per eigensolver (Eigen vs LAPACK vs nalgebra vs our closed form).
The signed point-to-plane distances flip with the normal sign, which moves
the median/MAD rejection band and therefore every logged statistic: with
numpy-eigh signs the dragon orig row is (766, +0.0691, 0.3119); random sign
draws land on the published (767, 0.0001, 0.3203). SURVEY.md Q12.

What IS sign-invariant — and pinned here against the published output:
  * the iteration count (6 printed rows; per Q6 the converging iteration's
    row is never printed, so 7 iterations execute);
  * the residual-spread decay (orig std ~0.32 -> final printed std 0.0022);
  * the final H within its print precision basin.
Plus the demonstration itself, locked as a test so the scope claim stays
true: a random-sign draw reproduces the published orig row while the
deterministic eigh-sign row differs in the mean by >0.05.
"""

import numpy as np
import pytest

from simpleicp_tpu import IcpConfig
from simpleicp_tpu.models.icp import icp_register

# /root/reference/README.md:156-160
PUBLISHED_H = np.array(
    [
        [0.998696, 0.052621, -0.034179, -0.206737],
        [-0.052090, 0.999028, 0.020119, -0.408088],
        [0.034822, -0.018663, 0.999436, -0.593361],
        [0.0, 0.0, 0.0, 1.0],
    ]
)
# /root/reference/README.md:147-154 (orig + 6 printed rows)
PUBLISHED_ORIG_STD = 0.3203
PUBLISHED_FINAL_STD = 0.0022
PUBLISHED_PRINTED_ROWS = 6


@pytest.fixture(scope="module")
def dragon_cpp_result(dragon):
    X_fix, X_mov = dragon
    cfg = IcpConfig(
        solver="linearized",
        mad_scale=1.4826,
        rejection_staging="joint",
        std_ddof=1,
    )
    return icp_register(X_fix, X_mov, cfg)


def test_published_dragon_iteration_count(dragon_cpp_result):
    """6 printed rows; the C++ loop checks convergence BEFORE printing
    (/root/reference/c++/src/simpleicp.cpp:72-98, SURVEY.md Q6), so the
    converging 7th iteration executes without a row."""
    res = dragon_cpp_result
    assert bool(res.converged)
    assert int(res.n_iterations) == PUBLISHED_PRINTED_ROWS + 1


def test_published_dragon_std_decay(dragon_cpp_result):
    """The residual-spread column: orig ~0.32 (sign-dependent by a few
    percent — see module docstring), last printed row 0.0022 (at
    convergence the residuals are near-symmetric noise, so the std is
    sign-robust there)."""
    res = dragon_cpp_result
    assert abs(float(res.orig_std) - PUBLISHED_ORIG_STD) < 0.012
    n_printed = int(res.n_iterations) - 1
    final_printed_std = float(np.asarray(res.iter_stds)[n_printed - 1])
    assert abs(final_printed_std - PUBLISHED_FINAL_STD) < 5e-4
    # monotone decay across the printed rows, like the published column
    stds = np.asarray(res.iter_stds)[:n_printed]
    assert np.all(np.diff(stds) < 0)


def test_published_dragon_final_H(dragon_cpp_result):
    """Final H within the published print precision basin: rotation to
    <0.1 deg, translation to ~1e-2 (the residual gap is the rejection-set
    difference from the eigenvector signs, SURVEY.md Q12)."""
    H = np.asarray(dragon_cpp_result.H)
    R = PUBLISHED_H[:3, :3] @ H[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)))
    assert ang < 0.1
    np.testing.assert_allclose(H[:3, 3], PUBLISHED_H[:3, 3], atol=1.5e-2)


def test_published_stats_are_eigensign_artifacts(dragon):
    """Lock the Q12 evidence: with numpy-eigh normal signs the dragon orig
    row's MEAN is far from the published 0.0001 (|mean| > 0.05), while some
    fixed random sign draw reproduces the published row (count within 2,
    std within 2e-3) — so pinning the published counts/means bitwise would
    be pinning Eigen's eigenvector sign pattern, not the algorithm."""
    from scipy.spatial import cKDTree

    X_fix, X_mov = dragon
    C = 1000
    sel = np.round(np.linspace(0, X_fix.shape[0] - 1, C)).astype(int)
    Q = X_fix[sel]
    _, idxk = cKDTree(X_fix).query(Q, k=10)
    normals = np.zeros((C, 3))
    plan = np.zeros(C)
    for i in range(C):
        P = X_fix[idxk[i]]
        w, v = np.linalg.eigh(np.cov(P.T, ddof=1))
        normals[i] = v[:, 0]
        plan[i] = (w[1] - w[0]) / w[2]
    _, mi = cKDTree(X_mov).query(Q, k=1)
    base_d = np.sum((X_mov[mi] - Q) * normals, axis=1)

    def orig_row(d):
        med = np.median(d)
        sig = 1.4826 * np.median(np.abs(d - med))
        keep = (np.abs(d - med) <= 3 * sig) & (plan >= 0.3)
        return int(keep.sum()), float(d[keep].mean()), float(
            d[keep].std(ddof=1)
        )

    _, mean_eigh, _ = orig_row(base_d)
    assert abs(mean_eigh - 0.0001) > 0.05  # deterministic signs: far off

    reproduced = False
    for seed in range(8):
        rng = np.random.default_rng(seed)
        cnt, mean, std = orig_row(base_d * rng.choice([-1.0, 1.0], C))
        if abs(cnt - 767) <= 2 and abs(std - 0.3203) < 2e-3:
            reproduced = True
            break
    assert reproduced
