"""Standalone numpy+scipy per-iteration oracle of the reference ICP family.

A clean-room host implementation of the reference algorithm contract
(SURVEY.md §1) built on scipy.spatial.cKDTree + scipy.optimize.least_squares
— structurally the reference's own stack (KD-tree matching, host loop,
TRF nonlinear solver), sharing no code with the jitted pipeline it oracles.
It records the full per-iteration trace (correspondence counts after
rejection, mean/std of residuals, parameters, H) so tests can assert
iteration-by-iteration equality against the TPU pipeline in f64.

Behavioral sources (all /root/reference/):
  * driver loop:        python/simpleicp/simpleicp.py:184-281
  * overlap gate:       python/simpleicp/pointcloud.py:149-171 (Q10: under
                        the initial transform, simpleicp.py:158-163)
  * selection:          python/simpleicp/pointcloud.py:132-147
  * normals:            python/simpleicp/pointcloud.py:173-203
  * matching:           python/simpleicp/corrpts.py:124-137
  * rejection:          python/simpleicp/corrpts.py:139-188 ("python"
                        staging) / c++/src/corrpts.cpp:59-89 ("joint")
  * linearized solve:   c++/src/corrpts.cpp:110-156, rust/src/icp.rs:310-347
  * nonlinear solve:    python/simpleicp/optimization.py:65-124 (lmfit's
                        method="least_squares" is scipy TRF)
  * convergence:        python/simpleicp/simpleicp.py:355-379
                        (incl. the old==0 guard)

Every Q1-Q11 divergence (SURVEY.md §2.9) is a keyword argument here, with
defaults matching the pipeline's documented decisions (PARITY.md):
mad_scale (Q1), composition fixed to dH·H (Q2), min_change (Q3), staging
(Q5), std_ddof (Q8), initial-H-before-gate (Q10), user normals (Q11).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
from scipy.optimize import least_squares
from scipy.spatial import cKDTree


def rotation(a1: float, a2: float, a3: float) -> np.ndarray:
    """Exact x->y->z Euler rotation (/root/reference/python/simpleicp/mathutils.py:39-68)."""
    c1, s1 = np.cos(a1), np.sin(a1)
    c2, s2 = np.cos(a2), np.sin(a2)
    c3, s3 = np.cos(a3), np.sin(a3)
    return np.array([
        [c2 * c3, -c2 * s3, s2],
        [c1 * s3 + s1 * s2 * c3, c1 * c3 - s1 * s2 * s3, -s1 * c2],
        [s1 * s3 - c1 * s2 * c3, s1 * c3 + c1 * s2 * s3, c1 * c2],
    ])


def make_H(p: np.ndarray) -> np.ndarray:
    H = np.eye(4)
    H[:3, :3] = rotation(p[0], p[1], p[2])
    H[:3, 3] = p[3:6]
    return H


def transform(X: np.ndarray, H: np.ndarray) -> np.ndarray:
    return X @ H[:3, :3].T + H[:3, 3]


def euler_from_R(R: np.ndarray):
    """R -> (a1, a2, a3) (/root/reference/python/simpleicp/mathutils.py:71-78)."""
    return (
        np.arctan2(-R[1, 2], R[2, 2]),
        np.arcsin(R[0, 2]),
        np.arctan2(-R[0, 1], R[0, 0]),
    )


def select_n_points(sel_idx: np.ndarray, n: int) -> np.ndarray:
    """round(linspace) over the selected indices
    (/root/reference/python/simpleicp/pointcloud.py:141-147)."""
    if len(sel_idx) > n:
        pos = np.round(np.linspace(0, len(sel_idx) - 1, n)).astype(int)
        return sel_idx[pos]
    return sel_idx


def estimate_normals(X: np.ndarray, sel_idx: np.ndarray, k: int):
    """k-NN covariance eigendecomposition normals at the selected points,
    querying the FULL cloud (/root/reference/python/simpleicp/pointcloud.py:173-203).

    Returns (normals (n,3), planarity (n,)); eigensolver is numpy's symmetric
    eigh (ascending), normal = smallest-eigenvalue eigenvector,
    planarity = (lambda_mid - lambda_min) / lambda_max.
    """
    tree = cKDTree(X)
    _, nn = tree.query(X[sel_idx], k=k, workers=-1)
    neigh = X[nn]
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    C = np.einsum("nki,nkj->nij", centered, centered) / (k - 1)
    w, v = np.linalg.eigh(C)  # ascending eigenvalues
    normals = v[:, :, 0]
    planarity = (w[:, 1] - w[:, 0]) / w[:, 2]
    return normals, planarity


def _pct_change(new: float, old: float) -> float:
    # /root/reference/python/simpleicp/simpleicp.py:355-379 incl. old==0 guard
    if old == 0.0 and new == 0.0:
        return 0.0
    if old == 0.0:
        return np.inf
    return abs((new - old) / old * 100.0)


@dataclasses.dataclass
class OracleTrace:
    """Per-iteration trace of one oracle run (parallel lists, one entry per
    executed ICP iteration, converging iteration included)."""

    counts: List[int] = dataclasses.field(default_factory=list)
    means: List[float] = dataclasses.field(default_factory=list)
    stds: List[float] = dataclasses.field(default_factory=list)
    ps: List[np.ndarray] = dataclasses.field(default_factory=list)
    Hs: List[np.ndarray] = dataclasses.field(default_factory=list)
    orig_count: int = 0
    orig_mean: float = 0.0
    orig_std: float = 0.0
    n_iterations: int = 0
    converged: bool = False
    H: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4))
    p: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(6))
    sel_idx: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, int))
    normals: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 3)))
    planarity: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    distance_weight: float = 1.0


def run_reference_icp(
    X_fix: np.ndarray,
    X_mov: np.ndarray,
    *,
    correspondences: int = 1000,
    neighbors: int = 10,
    min_planarity: float = 0.3,
    max_overlap_distance: float = np.inf,
    min_change: float = 1.0,
    max_iterations: int = 100,
    solver: str = "nonlinear",
    mad_scale: float = 1.4826,
    staging: str = "python",
    std_ddof: int = 0,
    distance_weights: Optional[float] = 1.0,
    obs_vals: Optional[np.ndarray] = None,
    obs_w: Optional[np.ndarray] = None,
    normals_fix: Optional[np.ndarray] = None,
    planarity_fix: Optional[np.ndarray] = None,
) -> OracleTrace:
    """Run the reference ICP host loop; see module docstring for semantics."""
    Xf = np.asarray(X_fix, np.float64)
    Xm = np.asarray(X_mov, np.float64)
    obs_vals = np.zeros(6) if obs_vals is None else np.asarray(obs_vals, np.float64)
    obs_w = np.zeros(6) if obs_w is None else np.asarray(obs_w, np.float64)
    vary = np.isfinite(obs_w)
    is_obs = vary & (obs_w > 0)

    p = obs_vals.copy()  # initial values = the observed values
    H = make_H(p)
    trace = OracleTrace()

    # Overlap gate under the initial transform (Q10).
    sel_idx = np.arange(len(Xf))
    if np.isfinite(max_overlap_distance) and max_overlap_distance > 0:
        Xm0 = transform(Xm, H)
        d, _ = cKDTree(Xm0).query(Xf, k=1, workers=-1)
        sel_idx = np.nonzero(d <= max_overlap_distance)[0]
        if len(sel_idx) == 0:
            raise RuntimeError("no overlap")

    sel_idx = select_n_points(sel_idx, correspondences)
    Q = Xf[sel_idx]

    if normals_fix is not None:
        N = np.asarray(normals_fix, np.float64)[sel_idx]
        pl = (
            np.ones(len(sel_idx))
            if planarity_fix is None
            else np.asarray(planarity_fix, np.float64)[sel_idx]
        )
    else:
        N, pl = estimate_normals(Xf, sel_idx, neighbors)

    trace.sel_idx = sel_idx
    trace.normals = N
    trace.planarity = pl

    auto_dw = distance_weights is None
    dw = 1.0 if auto_dw else float(distance_weights)
    prev_mean = prev_std = None

    for it in range(max_iterations):
        Xm_t = transform(Xm, H)
        # NN with deterministic tie-breaking: quantized datasets (bunny's
        # 2-decimal coordinates) produce EXACT nearest-neighbor distance
        # ties, where every implementation legitimately differs. Pick the
        # lowest movable index among exact ties — the argmin-first-occurrence
        # rule of the pipeline's scan kernel — so the comparison tests the
        # algorithm, not KD-tree traversal order.
        k_tie = min(16, len(Xm_t))
        dd, mi_k = cKDTree(Xm_t).query(Q, k=k_tie, workers=-1)
        if k_tie == 1:
            mi = mi_k
        else:
            tied = dd == dd[:, :1]
            mi = np.where(tied, mi_k, np.iinfo(np.int64).max).min(axis=1)
        d = np.einsum("ij,ij->i", Xm_t[mi] - Q, N)

        keep_pl = pl >= min_planarity
        base = keep_pl if staging == "python" else np.ones(len(d), bool)
        med = np.median(d[base])
        mad = np.median(np.abs(d[base] - med))
        keep = keep_pl & (np.abs(d - med) <= 3.0 * mad_scale * mad)
        count = int(keep.sum())
        if count < 6:
            raise RuntimeError("too few correspondences")

        if it == 0:
            trace.orig_count = count
            trace.orig_mean = float(d[keep].mean())
            trace.orig_std = float(d[keep].std(ddof=std_ddof))
            if auto_dw:
                # population std, frozen after iteration 0
                # (/root/reference/python/simpleicp/simpleicp.py:229-234)
                dw = 1.0 / d[keep].std() ** 2

        if solver == "linearized":
            # A/l rows of /root/reference/c++/src/corrpts.cpp:132-139 on the
            # already-transformed points; single solve; dH·H composition (Q2).
            P = Xm_t[mi][keep]
            nk = N[keep]
            x, y, z = P[:, 0], P[:, 1], P[:, 2]
            nx, ny, nz = nk[:, 0], nk[:, 1], nk[:, 2]
            A = np.column_stack(
                [-z * ny + y * nz, z * nx - x * nz, -y * nx + x * ny, nx, ny, nz]
            )
            l = np.einsum("ij,ij->i", nk, Q[keep] - P)
            sol, *_ = np.linalg.lstsq(A, l, rcond=None)
            res = A @ sol - l
            dH = np.eye(4)
            dH[:3, :3] = [
                [1.0, -sol[2], sol[1]],
                [sol[2], 1.0, -sol[0]],
                [-sol[1], sol[0], 1.0],
            ]
            dH[:3, 3] = sol[3:6]
            H = dH @ H
            a1, a2, a3 = euler_from_R(H[:3, :3])
            p = np.array([a1, a2, a3, H[0, 3], H[1, 3], H[2, 3]])
        else:
            # Absolute-parameter nonlinear re-solve on ORIGINAL-frame movable
            # points, warm-started from the previous estimate
            # (/root/reference/python/simpleicp/optimization.py:65-124;
            # frozen parameters via subset reparametrization = lmfit
            # vary=False). Tight tolerances: the oracle solves to machine
            # precision so trace comparisons test the pipeline, not TRF
            # stopping rules.
            P0 = Xm[mi][keep]
            Qk, nk = Q[keep], N[keep]

            def fun(xv):
                pf = np.where(vary, 0.0, obs_vals)
                pf[vary] = xv
                R = rotation(pf[0], pf[1], pf[2])
                r = np.einsum("ij,ij->i", P0 @ R.T + pf[3:6] - Qk, nk) * dw
                r_obs = obs_w[is_obs] * (pf[is_obs] - obs_vals[is_obs])
                return np.concatenate([r, r_obs])

            sol = least_squares(
                fun, p[vary], method="trf", xtol=1e-15, ftol=1e-15, gtol=1e-15
            )
            p = np.where(vary, 0.0, obs_vals)
            p[vary] = sol.x
            H = make_H(p)
            R = H[:3, :3]
            res = np.einsum("ij,ij->i", P0 @ R.T + p[3:6] - Qk, nk)

        mean = float(res.mean())
        std = float(res.std(ddof=std_ddof))
        trace.counts.append(count)
        trace.means.append(mean)
        trace.stds.append(std)
        trace.ps.append(p.copy())
        trace.Hs.append(H.copy())

        if (
            it > 0
            and _pct_change(mean, prev_mean) < min_change
            and _pct_change(std, prev_std) < min_change
        ):
            trace.converged = True
            trace.n_iterations = it + 1
            break
        prev_mean, prev_std = mean, std
    else:
        trace.n_iterations = max_iterations

    trace.H = H
    trace.p = p
    trace.distance_weight = dw
    return trace
