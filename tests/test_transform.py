"""Unit tests for rigid-body math (parity vs reference formulas in
/root/reference/python/simpleicp/mathutils.py)."""

import jax.numpy as jnp
import numpy as np

from simpleicp_tpu.ops import transform as tr


def _ref_rotation(a1, a2, a3):
    c1, s1, c2, s2, c3, s3 = (
        np.cos(a1), np.sin(a1), np.cos(a2), np.sin(a2), np.cos(a3), np.sin(a3),
    )
    return np.array(
        [
            [c2 * c3, -c2 * s3, s2],
            [c1 * s3 + s1 * s2 * c3, c1 * c3 - s1 * s2 * s3, -s1 * c2],
            [s1 * s3 - c1 * s2 * c3, s1 * c3 + c1 * s2 * s3, c1 * c2],
        ]
    )


def test_rotation_matrix_matches_reference_formula(rng):
    for _ in range(20):
        a = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, 3)
        R = np.asarray(tr.euler_angles_to_rotation_matrix(*a))
        np.testing.assert_allclose(R, _ref_rotation(*a), atol=1e-12)
        # orthonormal, det +1
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0.999


def test_rotation_roundtrip(rng):
    for _ in range(20):
        a = rng.uniform(-1.2, 1.2, 3)
        R = tr.euler_angles_to_rotation_matrix(*a)
        back = np.array(tr.rotation_matrix_to_euler_angles(R))
        np.testing.assert_allclose(back, a, atol=1e-10)


def test_linearized_matches_exact_to_first_order():
    a = np.array([1e-4, -2e-4, 3e-4])
    R = np.asarray(tr.euler_angles_to_rotation_matrix(*a))
    dR = np.asarray(tr.euler_angles_to_linearized_rotation_matrix(*a))
    np.testing.assert_allclose(R, dR, atol=1e-7)


def test_H_compose_invert(rng):
    a = rng.uniform(-1, 1, 3)
    t = rng.uniform(-5, 5, 3)
    H = tr.make_H(tr.euler_angles_to_rotation_matrix(*a), jnp.asarray(t))
    Hinv = tr.invert_H(H)
    np.testing.assert_allclose(np.asarray(H @ Hinv), np.eye(4), atol=1e-12)

    X = rng.normal(size=(50, 3))
    Xt = tr.apply_H(jnp.asarray(X), H)
    Xback = tr.apply_H(Xt, Hinv)
    np.testing.assert_allclose(np.asarray(Xback), X, atol=1e-10)


def test_rbp_to_H():
    p = jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0])
    H = np.asarray(tr.rbp_to_H(p))
    np.testing.assert_allclose(H[:3, :3], _ref_rotation(0.1, -0.2, 0.3), atol=1e-12)
    np.testing.assert_allclose(H[:3, 3], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(H[3], [0, 0, 0, 1])
