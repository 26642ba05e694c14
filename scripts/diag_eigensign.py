"""Why the reference's published iteration tables cannot be reproduced
bit-for-bit across implementations: eigenvector SIGN.

The reference README publishes the C++ dragon convergence table
(/root/reference/README.md:142-163): orig row (767, 0.0001, 0.3203), six
iteration rows, the final H. Re-running the same pipeline (same data, same
selection, same joint rejection, same 1.4826 MAD) with numpy gives
(766, 0.0691, 0.3119) — the count and std are close, but the MEAN is off by
three orders of magnitude.

The cause: the normal at each selected point is the smallest-eigenvalue
eigenvector of the neighborhood covariance, whose SIGN is arbitrary
(SURVEY.md §1 step 3). The sign does not matter for the SOLVE (the
point-to-plane residual enters quadratically via its own row), but the
REJECTION band is |d - median(d)| <= 3 sigma_MAD over the SIGNED distances
d_i = (p_mov - p_fix) . n_i — flipping n_i flips d_i, which moves the
median, the MAD, the survivor set, and every logged count/mean/std.
Each implementation's eigensolver has a different effective sign pattern:

  * C++   Eigen::SelfAdjointEigenSolver (tridiagonal QR) — effectively
          unstructured signs (/root/reference/c++/src/pointcloud.cpp:97-139)
  * Python np.linalg.eig, general solver, descending sort
          (/root/reference/python/simpleicp/pointcloud.py:188-198)
  * Rust  nalgebra symmetric_eigen (/root/reference/rust/src/icp.rs:269-306)
  * ours / the test oracle: np.linalg.eigh convention
          (ops/normals.py, tests/reference_oracle.py:83-99)

This script demonstrates that RANDOM sign draws reproduce the published
C++ orig row almost exactly (e.g. seed 4: count=767, mean=-0.0028,
std=0.3203 vs published 767, 0.0001, 0.3203), i.e. the published counts /
means / stds are artifacts of Eigen's sign pattern, not invariants of the
algorithm. Only sign-INVARIANT quantities are legitimately comparable
across implementations: the iteration count, the residual-spread decay,
and the final H (pinned by tests/test_published_trace.py).

Run: python scripts/diag_eigensign.py
"""

import numpy as np
from scipy.spatial import cKDTree

PUBLISHED_ORIG = (767, 0.0001, 0.3203)  # /root/reference/README.md:148


def dragon_iter0_stats(sign_seed=None):
    """(count, mean, std) of the dragon iteration-0 post-rejection distances
    under the joint (C++-family) rejection, with eigh normal signs
    (sign_seed=None) or a random sign flip per normal."""
    Xf = np.loadtxt("/root/reference/data/dragon1.xyz")
    Xm = np.loadtxt("/root/reference/data/dragon2.xyz")
    C = 1000
    sel = np.round(np.linspace(0, Xf.shape[0] - 1, C)).astype(int)
    Q = Xf[sel]
    _, idxk = cKDTree(Xf).query(Q, k=10)
    normals = np.zeros((C, 3))
    plan = np.zeros(C)
    for i in range(C):
        P = Xf[idxk[i]]
        w, v = np.linalg.eigh(np.cov(P.T, ddof=1))
        normals[i] = v[:, 0]
        plan[i] = (w[1] - w[0]) / w[2]
    _, mi = cKDTree(Xm).query(Q, k=1)
    d = np.sum((Xm[mi] - Q) * normals, axis=1)
    if sign_seed is not None:
        rng = np.random.default_rng(sign_seed)
        d = d * rng.choice([-1.0, 1.0], C)
    med = np.median(d)
    sig = 1.4826 * np.median(np.abs(d - med))
    keep = (np.abs(d - med) <= 3 * sig) & (plan >= 0.3)
    dk = d[keep]
    return int(keep.sum()), float(dk.mean()), float(dk.std(ddof=1))


if __name__ == "__main__":
    print(f"published C++ orig row:    count={PUBLISHED_ORIG[0]} "
          f"mean={PUBLISHED_ORIG[1]:+.4f} std={PUBLISHED_ORIG[2]:.4f}")
    c, m, s = dragon_iter0_stats()
    print(f"numpy eigh signs:          count={c} mean={m:+.4f} std={s:.4f}")
    for seed in range(8):
        c, m, s = dragon_iter0_stats(seed)
        print(f"random signs (seed {seed}):    count={c} mean={m:+.4f} "
              f"std={s:.4f}")
