"""Motion-only BA tests: convergence to ground truth, outlier rejection (SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_framework_tpu.geometry import se3
from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.optim import pose_opt

K = Intrinsics(fx=718.856, fy=718.856, cx=607.19, cy=185.22, bf=386.1448)


def make_problem(rng, n=200, stereo=True, noise_px=0.3, outlier_frac=0.0, pose_err=0.1):
    pts = np.stack(
        [rng.uniform(-15, 15, n), rng.uniform(-4, 4, n), rng.uniform(4, 50, n)], -1
    ).astype(np.float32)
    xi_true = rng.normal(size=6).astype(np.float32) * 0.05
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))

    Xc = (T_true[:3, :3] @ pts.T).T + T_true[:3, 3]
    z = Xc[:, 2]
    u = K.fx * Xc[:, 0] / z + K.cx + rng.normal(0, noise_px, n)
    v = K.fy * Xc[:, 1] / z + K.cy + rng.normal(0, noise_px, n)
    ur = (u - K.bf / z + rng.normal(0, noise_px, n)) if stereo else np.full(n, -1.0)

    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    u[out_idx] += rng.uniform(20, 80, n_out) * rng.choice([-1, 1], n_out)
    v[out_idx] += rng.uniform(20, 80, n_out) * rng.choice([-1, 1], n_out)

    obs = pose_opt.PoseObs(
        points_w=jnp.asarray(pts),
        uv=jnp.asarray(np.stack([u, v], -1), dtype=jnp.float32),
        ur=jnp.asarray(ur, dtype=jnp.float32),
        inv_sigma2=jnp.ones(n, jnp.float32),
        mask=jnp.ones(n, bool),
    )
    # Perturbed initial pose
    xi_pert = rng.normal(size=6).astype(np.float32)
    xi_pert = xi_pert / np.linalg.norm(xi_pert) * pose_err
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi_pert))) @ T_true
    return jnp.asarray(T0), obs, T_true, out_idx


def pose_error(T_est, T_true):
    delta = np.asarray(T_est) @ np.linalg.inv(T_true)
    rot_err = np.arccos(np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1))
    trans_err = np.linalg.norm(delta[:3, 3])
    return rot_err, trans_err


def test_pose_opt_converges_clean_stereo(rng):
    T0, obs, T_true, _ = make_problem(rng, stereo=True, noise_px=0.0)
    res = pose_opt.optimize_pose(T0, obs, K)
    rot_err, trans_err = pose_error(res.pose, T_true)
    assert trans_err < 1e-3, trans_err
    assert rot_err < 1e-4, rot_err
    assert int(res.num_inliers) == 200


def test_pose_opt_converges_clean_mono(rng):
    T0, obs, T_true, _ = make_problem(rng, stereo=False, noise_px=0.0)
    res = pose_opt.optimize_pose(T0, obs, K)
    rot_err, trans_err = pose_error(res.pose, T_true)
    assert trans_err < 5e-3, trans_err
    assert rot_err < 1e-3, rot_err


def test_pose_opt_with_noise(rng):
    T0, obs, T_true, _ = make_problem(rng, stereo=True, noise_px=0.5)
    res = pose_opt.optimize_pose(T0, obs, K)
    rot_err, trans_err = pose_error(res.pose, T_true)
    assert trans_err < 0.02, trans_err
    assert rot_err < 2e-3, rot_err


def test_pose_opt_rejects_outliers(rng):
    T0, obs, T_true, out_idx = make_problem(rng, stereo=True, noise_px=0.3, outlier_frac=0.3)
    res = pose_opt.optimize_pose(T0, obs, K)
    rot_err, trans_err = pose_error(res.pose, T_true)
    assert trans_err < 0.03, trans_err
    inl = np.asarray(res.inliers)
    assert not inl[out_idx].any(), "gross outliers classified as inliers"
    assert inl.sum() > 120  # most true inliers kept


def test_pose_opt_respects_mask(rng):
    T0, obs, T_true, _ = make_problem(rng, stereo=True, noise_px=0.0)
    # corrupt half the observations but mask them out
    uv = np.array(obs.uv)
    uv[100:] += 500.0
    obs = obs._replace(uv=jnp.asarray(uv), mask=jnp.asarray(np.arange(200) < 100))
    res = pose_opt.optimize_pose(T0, obs, K)
    _, trans_err = pose_error(res.pose, T_true)
    assert trans_err < 1e-3
    assert int(res.num_inliers) == 100


def test_pose_opt_jit_and_fixed_shapes(rng):
    """The optimizer must be jittable and reusable across problems of equal size."""
    f = jax.jit(lambda T0, obs: pose_opt.optimize_pose(T0, obs, K))
    for seed in range(3):
        r = np.random.default_rng(seed)
        T0, obs, T_true, _ = make_problem(r, stereo=True, noise_px=0.2)
        res = f(T0, obs)
        _, trans_err = pose_error(res.pose, T_true)
        assert trans_err < 0.02


def test_pose_opt_behind_camera_is_outlier(rng):
    T0, obs, T_true, _ = make_problem(rng, stereo=True, noise_px=0.0)
    pts = np.array(obs.points_w)
    pts[0] = [0, 0, -10.0]  # behind the camera
    obs = obs._replace(points_w=jnp.asarray(pts))
    res = pose_opt.optimize_pose(T0, obs, K)
    assert not bool(res.inliers[0])
