"""Registration-quality metrics.

The reference reports only residual statistics of its own correspondences;
these are implementation-independent quality measures used by our oracle
tests (tests/test_icp.py) and exposed for users evaluating registrations.
"""

from __future__ import annotations

import numpy as np


def nn_rmse(X_from, X_to, *, step: int = 1) -> float:
    """Root-mean-square nearest-neighbor distance from X_from (optionally
    subsampled by `step`) to X_to. The standard "how well do the clouds
    overlap after registration" scalar."""
    from .ops.knn import nn_search

    d2, _ = nn_search(np.asarray(X_from)[::step], np.asarray(X_to))
    return float(np.sqrt(np.mean(np.asarray(d2))))


def chamfer_distance(X_a, X_b, *, step: int = 1) -> float:
    """Symmetric mean squared NN distance (Chamfer-L2) between two clouds."""
    from .ops.knn import nn_search

    Xa = np.asarray(X_a)[::step]
    Xb = np.asarray(X_b)[::step]
    d_ab, _ = nn_search(Xa, Xb)
    d_ba, _ = nn_search(Xb, Xa)
    return float(np.mean(np.asarray(d_ab)) + np.mean(np.asarray(d_ba)))


def rotation_angle_deg(R_a, R_b) -> float:
    """Geodesic angle (degrees) between two rotation matrices."""
    R_a = np.asarray(R_a)[:3, :3]
    R_b = np.asarray(R_b)[:3, :3]
    cos = (np.trace(R_a.T @ R_b) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
