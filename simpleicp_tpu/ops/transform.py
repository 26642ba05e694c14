"""Rigid-body math: Euler-angle rotations, homogeneous transforms.

Functional jnp equivalents of the reference math utilities
(/root/reference/python/simpleicp/mathutils.py:10-93). The Euler convention is
the reference's x->y->z composition (/root/reference/README.md:97-108): with
c_i = cos(alpha_i), s_i = sin(alpha_i),

    R = [[ c2 c3,            -c2 s3,             s2    ],
         [ c1 s3 + s1 s2 c3,  c1 c3 - s1 s2 s3, -s1 c2 ],
         [ s1 s3 - c1 s2 c3,  s1 c3 + c1 s2 s3,  c1 c2 ]]

All functions are shape-polymorphic over leading batch dims where noted and
jit/vmap/grad-safe (no Python control flow on traced values).
"""

from __future__ import annotations

import jax.numpy as jnp


def euler_coord_to_homogeneous_coord(X: jnp.ndarray) -> jnp.ndarray:
    """(n, 3) -> (n, 4) homogeneous coordinates
    (/root/reference/python/simpleicp/mathutils.py:10-16)."""
    n = X.shape[0]
    return jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=1)


def homogeneous_coord_to_euler_coord(Xh: jnp.ndarray) -> jnp.ndarray:
    """(n, 4) -> (n, 3) Euclidean coordinates, dividing by w
    (/root/reference/python/simpleicp/mathutils.py:19-26)."""
    return Xh[:, :3] / Xh[:, 3:4]


def euler_angles_to_rotation_matrix(alpha1, alpha2, alpha3) -> jnp.ndarray:
    """Exact rotation matrix from the three Euler angles (radians)."""
    c1, s1 = jnp.cos(alpha1), jnp.sin(alpha1)
    c2, s2 = jnp.cos(alpha2), jnp.sin(alpha2)
    c3, s3 = jnp.cos(alpha3), jnp.sin(alpha3)
    return jnp.stack(
        [
            jnp.stack([c2 * c3, -c2 * s3, s2]),
            jnp.stack([c1 * s3 + s1 * s2 * c3, c1 * c3 - s1 * s2 * s3, -s1 * c2]),
            jnp.stack([s1 * s3 - c1 * s2 * c3, s1 * c3 + c1 * s2 * s3, c1 * c2]),
        ]
    )


def euler_angles_to_linearized_rotation_matrix(alpha1, alpha2, alpha3) -> jnp.ndarray:
    """Small-angle linearization R ~= I + skew(alpha)."""
    one = jnp.ones_like(alpha1)
    return jnp.stack(
        [
            jnp.stack([one, -alpha3, alpha2]),
            jnp.stack([alpha3, one, -alpha1]),
            jnp.stack([-alpha2, alpha1, one]),
        ]
    )


def rotation_matrix_to_euler_angles(R: jnp.ndarray):
    """Recover (alpha1, alpha2, alpha3) from a rotation matrix."""
    alpha1 = jnp.arctan2(-R[1, 2], R[2, 2])
    alpha2 = jnp.arcsin(R[0, 2])
    alpha3 = jnp.arctan2(-R[0, 1], R[0, 0])
    return alpha1, alpha2, alpha3


def make_H(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous 4x4 transform [R t; 0 1]."""
    H = jnp.eye(4, dtype=R.dtype)
    H = H.at[:3, :3].set(R)
    H = H.at[:3, 3].set(t)
    return H


def rbp_to_H(p: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform from the 6-vector (alpha1, alpha2, alpha3, tx, ty, tz)."""
    R = euler_angles_to_rotation_matrix(p[0], p[1], p[2])
    return make_H(R, p[3:6])


def invert_H(H: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of a rigid transform: [R^T, -R^T t; 0 1]."""
    R = H[:3, :3]
    t = H[:3, 3]
    return make_H(R.T, -R.T @ t)


def apply_H(X: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to points of shape (..., 3): X R^T + t."""
    return X @ H[:3, :3].T + H[:3, 3]
