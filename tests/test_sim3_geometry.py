"""Unit tests for Sim3 group ops and projection/triangulation geometry."""

import jax.numpy as jnp
import numpy as np

from slam_framework_tpu.geometry import projection, se3, sim3, triangulation


def rand_sim3(rng, n=16, sigma_scale=0.3):
    w = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    t = rng.normal(size=(n, 3)).astype(np.float32)
    s = np.exp(rng.normal(size=(n,)).astype(np.float32) * sigma_scale)
    return sim3.make(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t), jnp.asarray(s))


def test_sim3_compose_inverse(rng):
    S = rand_sim3(rng)
    I = sim3.compose(S, sim3.inverse(S))
    np.testing.assert_allclose(np.asarray(I["R"]), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I["t"]), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(I["s"]), 1, atol=1e-5)


def test_sim3_apply_compose_consistent(rng):
    A = rand_sim3(rng, n=4)
    B = rand_sim3(rng, n=4)
    pts = jnp.asarray(rng.normal(size=(4, 10, 3)), dtype=jnp.float32)
    lhs = sim3.apply(sim3.compose(A, B), pts)
    rhs = sim3.apply(A, sim3.apply(B, pts))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_sim3_exp_log_roundtrip(rng):
    v = jnp.asarray(rng.normal(size=(32, 7)) * 0.4, dtype=jnp.float32)
    S = sim3.exp(v)
    v2 = sim3.log(S)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=2e-3)


def test_sim3_exp_zero_is_identity():
    S = sim3.exp(jnp.zeros((1, 7), jnp.float32))
    np.testing.assert_allclose(np.asarray(S["R"])[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(S["t"])[0], 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(S["s"])[0], 1, atol=1e-6)


def test_sim3_exp_scale_only():
    v = jnp.zeros((1, 7), jnp.float32).at[0, 6].set(0.7)
    S = sim3.exp(v)
    np.testing.assert_allclose(float(S["s"][0]), np.exp(0.7), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(S["R"])[0], np.eye(3), atol=1e-6)


KITTI_K = projection.Intrinsics(fx=718.856, fy=718.856, cx=607.19, cy=185.22, bf=386.14)


def test_project_backproject_roundtrip(rng):
    pts = np.stack(
        [rng.uniform(-20, 20, 100), rng.uniform(-5, 5, 100), rng.uniform(2, 60, 100)], axis=-1
    ).astype(np.float32)
    u, v, z = projection.project(jnp.asarray(pts), KITTI_K)
    back = projection.backproject(u, v, z, KITTI_K)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)


def test_stereo_disparity_depth(rng):
    pts = np.stack([rng.uniform(-10, 10, 50), rng.uniform(-3, 3, 50), rng.uniform(2, 40, 50)], -1).astype(np.float32)
    u, v, ur, z = projection.project_stereo(jnp.asarray(pts), KITTI_K)
    depth = projection.disparity_to_depth(u, ur, KITTI_K)
    np.testing.assert_allclose(np.asarray(depth), pts[:, 2], rtol=1e-3)


def test_undistort_identity_when_no_distortion(rng):
    uv = jnp.asarray(rng.uniform(0, 1000, size=(64, 2)), dtype=jnp.float32)
    out = projection.undistort_points(uv, KITTI_K, jnp.zeros(5, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(uv), atol=1e-4)


def test_undistort_inverts_distortion(rng):
    # Apply forward distortion to normalized points, then undistort back.
    dist = jnp.asarray([-0.28, 0.07, 1e-4, -2e-4, 0.0], dtype=jnp.float32)
    k1, k2, p1, p2 = -0.28, 0.07, 1e-4, -2e-4
    xy = rng.uniform(-0.3, 0.3, size=(100, 2)).astype(np.float32)
    x, y = xy[:, 0], xy[:, 1]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2**2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    uv_dist = np.stack([xd * KITTI_K.fx + KITTI_K.cx, yd * KITTI_K.fy + KITTI_K.cy], -1)
    out = projection.undistort_points(jnp.asarray(uv_dist, dtype=jnp.float32), KITTI_K, dist, iters=10)
    expected = np.stack([x * KITTI_K.fx + KITTI_K.cx, y * KITTI_K.fy + KITTI_K.cy], -1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=0.05)


def _pose_projmat(T, K):
    Kmat = np.array([[K.fx, 0, K.cx], [0, K.fy, K.cy], [0, 0, 1]], dtype=np.float32)
    return jnp.asarray(Kmat @ np.asarray(T)[:3, :])


def test_triangulation_recovers_points(rng):
    pts = np.stack([rng.uniform(-10, 10, 200), rng.uniform(-3, 3, 200), rng.uniform(4, 40, 200)], -1).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    xi = np.array([0.02, -0.01, 0.03, 0.5, 0.0, 0.1], dtype=np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    P1 = _pose_projmat(T1, KITTI_K)
    P2 = _pose_projmat(T2, KITTI_K)

    def proj(T, pts):
        pc = (np.asarray(T)[:3, :3] @ pts.T).T + np.asarray(T)[:3, 3]
        return np.stack([KITTI_K.fx * pc[:, 0] / pc[:, 2] + KITTI_K.cx,
                         KITTI_K.fy * pc[:, 1] / pc[:, 2] + KITTI_K.cy], -1)

    uv1 = jnp.asarray(proj(T1, pts))
    uv2 = jnp.asarray(proj(T2, pts))
    rec = triangulation.triangulate_dlt(P1, P2, uv1, uv2)
    np.testing.assert_allclose(np.asarray(rec), pts, rtol=2e-2, atol=2e-2)

    err2, z = triangulation.reprojection_error(P1, rec, uv1)
    assert float(jnp.max(err2)) < 1.0
    assert np.all(np.asarray(z) > 0)


def test_parallax_cosine():
    c1 = jnp.zeros(3)
    c2 = jnp.asarray([1.0, 0.0, 0.0])
    pts = jnp.asarray([[0.5, 0.0, 10.0], [0.5, 0.0, 1.0]])
    cos = np.asarray(triangulation.parallax_cosine(c1, c2, pts))
    assert cos[0] > cos[1]  # farther point has less parallax (cos closer to 1)
    assert np.all(cos > 0) and np.all(cos < 1)
