"""Normal estimation: batched covariance + closed-form symmetric 3x3 eigensolver.

The reference estimates one normal per selected point by looping in Python
over 1000 neighborhoods and calling a general eigensolver on each 3x3
covariance (/root/reference/python/simpleicp/pointcloud.py:188-198; Eigen
SelfAdjointEigenSolver per point in /root/reference/c++/src/pointcloud.cpp:97-139).
Here the whole batch is one fused vectorized kernel: covariance via a batched
matmul, eigenvalues via the trigonometric closed form for symmetric 3x3
matrices, and the smallest-eigenvalue eigenvector via row cross products —
no per-point host loop, no LAPACK.

Convention (matches every reference implementation, SURVEY.md §3.4):
    normal   = eigenvector of the smallest eigenvalue
    planarity = (lambda_mid - lambda_min) / lambda_max
Covariance is the unbiased (n-1) estimator. The eigenvector sign is
arbitrary, as in the reference (point-to-plane math is sign-consistent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh3x3(C: jnp.ndarray):
    """Eigenvalues (descending) and the smallest-eigenvalue eigenvector of
    symmetric 3x3 matrices.

    Args:
        C: (..., 3, 3) symmetric matrices.

    Returns:
        (eigvals, v_min): (..., 3) eigenvalues sorted descending and
        (..., 3) unit eigenvector of the smallest eigenvalue.
    """
    dtype = C.dtype
    eps = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-18, dtype)

    a00 = C[..., 0, 0]
    a11 = C[..., 1, 1]
    a22 = C[..., 2, 2]
    a01 = C[..., 0, 1]
    a02 = C[..., 0, 2]
    a12 = C[..., 1, 2]

    # Trigonometric eigenvalue formula for symmetric 3x3 (Smith, 1961).
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    p_safe = jnp.maximum(p, eps)

    # r = det(B) / 2 with B = (C - qI) / p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) / (p_safe * p_safe * p_safe)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)

    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    eigvals = jnp.stack([lam_max, lam_mid, lam_min], axis=-1)

    # Null space of A = C - lam_min I via the largest cross product of rows.
    d0, d1, d2 = a00 - lam_min, a11 - lam_min, a22 - lam_min
    r0 = jnp.stack([d0, a01, a02], axis=-1)
    r1 = jnp.stack([a01, d1, a12], axis=-1)
    r2 = jnp.stack([a02, a12, d2], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    crosses = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3, 3)
    norms2 = jnp.sum(crosses * crosses, axis=-1)  # (..., 3)
    best = jnp.argmax(norms2, axis=-1)
    v = jnp.take_along_axis(crosses, best[..., None, None], axis=-2)[..., 0, :]
    vnorm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))
    v_min = v / vnorm

    # Fully degenerate (isotropic) neighborhood: any direction works.
    degenerate = jnp.max(norms2, axis=-1) < eps
    fallback = jnp.zeros_like(v_min).at[..., 2].set(1.0)
    v_min = jnp.where(degenerate[..., None], fallback, v_min)
    return eigvals, v_min


@jax.jit
def estimate_normals_from_neighborhoods(neigh: jnp.ndarray):
    """Normals + planarity from gathered k-NN neighborhoods.

    Args:
        neigh: (n, k, 3) coordinates of the k nearest neighbors of each of the
            n selected points (the point itself is its own nearest neighbor,
            as in the reference's self-inclusive kNN query).

    Returns:
        (normals, planarity, eigvals): (n, 3) unit normals, (n,) planarity
        values in [0, 1], (n, 3) eigenvalues sorted descending.
    """
    k = neigh.shape[1]
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    # Unbiased covariance, matching np.cov(..., bias=False)
    # (/root/reference/python/simpleicp/pointcloud.py:190).
    C = jnp.einsum("nki,nkj->nij", centered, centered) / (k - 1)
    eigvals, v_min = eigh3x3(C)
    lam_max = eigvals[..., 0]
    safe = jnp.where(lam_max > 0, lam_max, 1.0)
    planarity = jnp.where(lam_max > 0, (eigvals[..., 1] - eigvals[..., 2]) / safe, 0.0)
    return v_min, planarity, eigvals
