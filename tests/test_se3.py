"""Unit tests for SO3/SE3 Lie ops against closed forms (SURVEY.md §4 test pyramid 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from slam_framework_tpu.geometry import se3


def random_twists(rng, n=64, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(128, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = ScipyRot.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = rng.normal(size=(128, 3)).astype(np.float32)
    # Keep |w| < pi for uniqueness
    norm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = w / norm * (norm % (np.pi * 0.95))
    R = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_log_small_angle():
    w = jnp.asarray([[1e-7, -2e-7, 3e-8], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)


def test_so3_log_near_pi():
    axis = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    w = axis * (np.pi - 1e-4)
    R = se3.so3_exp(jnp.asarray(w[None]))
    w2 = np.asarray(se3.so3_log(R))[0]
    np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = random_twists(rng, scale=0.5)
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_exp_is_homogeneous(rng):
    xi = random_twists(rng, n=8)
    T = np.asarray(se3.se3_exp(xi))
    np.testing.assert_allclose(T[:, 3, :], np.tile([0, 0, 0, 1], (8, 1)), atol=0)
    # Rotation block orthonormal
    R = T[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


def test_se3_inverse(rng):
    xi = random_twists(rng, n=16)
    T = se3.se3_exp(xi)
    TT = np.asarray(T @ se3.se3_inverse(T))
    np.testing.assert_allclose(TT, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_transform_points(rng):
    xi = random_twists(rng, n=1)[0]
    T = se3.se3_exp(xi)
    pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    out = np.asarray(se3.transform_points(T, pts))
    Tn = np.asarray(T)
    expected = (Tn[:3, :3] @ np.asarray(pts).T).T + Tn[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_rotation_to_quaternion(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    q = np.asarray(se3.rotation_to_quaternion(R))  # (x, y, z, w)
    q_ref = ScipyRot.from_matrix(np.asarray(R)).as_quat()
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-4)


def test_jit_and_grad_compatible(rng):
    xi = random_twists(rng, n=4)

    @jax.jit
    def loss(xi):
        T = se3.se3_exp(xi)
        return jnp.sum(T[..., :3, 3] ** 2)

    g = jax.grad(loss)(xi)
    assert g.shape == xi.shape
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 1.0, 2.5])
def test_left_jacobian_consistency(rng, scale):
    """V from so3_left_jacobian must match finite-difference of translation of exp."""
    w = jnp.asarray(rng.normal(size=(8, 3)) * scale, dtype=jnp.float32)
    u = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    xi = jnp.concatenate([w, u], axis=-1)
    T = se3.se3_exp(xi)
    V = se3.so3_left_jacobian(w)
    t_expected = jnp.einsum("nij,nj->ni", V, u)
    np.testing.assert_allclose(np.asarray(T[:, :3, 3]), np.asarray(t_expected), atol=1e-5)
