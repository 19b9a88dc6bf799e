"""Schur-complement local BA tests: convergence on synthetic multi-view problems."""

import jax.numpy as jnp
import numpy as np

from slam_framework_tpu.geometry import se3
from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.optim import local_ba

K = Intrinsics(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=270.0)


def build_problem(rng, n_cams=6, n_pts=200, noise_px=0.3, pose_noise=0.02, pt_noise=0.05,
                  stereo=True, outlier_frac=0.0, C=8, P=256, O=8):
    """Cameras on a line looking at a point cloud; first camera fixed."""
    pts = np.stack([rng.uniform(-10, 10, n_pts), rng.uniform(-5, 5, n_pts), rng.uniform(8, 30, n_pts)], -1).astype(np.float32)
    poses_true = []
    for i in range(n_cams):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-0.5 * i, 0.01 * i, 0.05 * i]  # Tcw translation
        w = np.array([0.002 * i, 0.004 * i, -0.001 * i], np.float32)
        T[:3, :3] = np.asarray(se3.so3_exp(jnp.asarray(w)))
        poses_true.append(T)
    poses_true = np.stack(poses_true)

    M = C * P
    obs_cam = np.zeros(M, np.int32)
    obs_pt = np.zeros(M, np.int32)
    obs_uv = np.zeros((M, 2), np.float32)
    obs_ur = np.full(M, -1.0, np.float32)
    obs_mask = np.zeros(M, bool)
    pt_slots = np.full((P, O), -1, np.int32)
    m = 0
    n_out = 0
    for p in range(n_pts):
        cnt = 0
        for c in range(n_cams):
            if cnt >= O:
                break
            T = poses_true[c]
            Xc = T[:3, :3] @ pts[p] + T[:3, 3]
            if Xc[2] < 1:
                continue
            u = K.fx * Xc[0] / Xc[2] + K.cx + rng.normal(0, noise_px)
            v = K.fy * Xc[1] / Xc[2] + K.cy + rng.normal(0, noise_px)
            if rng.uniform() < outlier_frac:
                u += rng.choice([-1, 1]) * rng.uniform(30, 90)
                n_out += 1
            obs_cam[m] = c
            obs_pt[m] = p
            obs_uv[m] = [u, v]
            if stereo:
                obs_ur[m] = u - K.bf / Xc[2] + rng.normal(0, noise_px)
            obs_mask[m] = True
            pt_slots[p, cnt] = m
            cnt += 1
            m += 1

    cam_pose = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    cam_pose[:n_cams] = poses_true.copy()
    # perturb all but the first
    for c in range(1, n_cams):
        xi = rng.normal(size=6).astype(np.float32) * pose_noise
        cam_pose[c] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ cam_pose[c]
    cam_fixed = np.ones(C, bool)
    cam_fixed[1:n_cams] = False
    cam_mask = np.zeros(C, bool)
    cam_mask[:n_cams] = True

    pt_pos = np.zeros((P, 3), np.float32)
    pt_pos[:n_pts] = pts + rng.normal(0, pt_noise, (n_pts, 3)).astype(np.float32)
    pt_mask = np.zeros(P, bool)
    pt_mask[:n_pts] = True

    prob = local_ba.BAProblem(
        cam_pose=jnp.asarray(cam_pose), cam_fixed=jnp.asarray(cam_fixed),
        cam_mask=jnp.asarray(cam_mask), pt_pos=jnp.asarray(pt_pos),
        pt_mask=jnp.asarray(pt_mask), obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt), obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur), obs_inv_sigma2=jnp.ones(M, jnp.float32),
        obs_mask=jnp.asarray(obs_mask), pt_obs_slots=jnp.asarray(pt_slots),
    )
    return prob, poses_true, pts, n_cams, n_pts


def cam_errors(res, poses_true, n_cams):
    errs = []
    for c in range(n_cams):
        delta = np.asarray(res.cam_pose[c]) @ np.linalg.inv(poses_true[c])
        errs.append(np.linalg.norm(delta[:3, 3]))
    return np.asarray(errs)


def test_local_ba_reduces_error(rng):
    prob, poses_true, pts, n_cams, n_pts = build_problem(rng)
    res = local_ba.optimize(prob, K)
    errs = cam_errors(res, poses_true, n_cams)
    # 0.3 px noise, ~20 m depths: statistical floor is ~7 mm for cams, ~7 cm for points
    assert errs.max() < 0.02, errs
    pt_err = np.linalg.norm(np.asarray(res.pt_pos[:n_pts]) - pts, axis=1)
    assert np.median(pt_err) < 0.15
    # must improve on the initial perturbation (2 cm poses, 5 cm points)
    assert errs[1:n_cams].max() < 0.015


def test_local_ba_clean_exact(rng):
    prob, poses_true, pts, n_cams, n_pts = build_problem(rng, noise_px=0.0, pose_noise=0.05, pt_noise=0.1)
    res = local_ba.optimize(prob, K)
    errs = cam_errors(res, poses_true, n_cams)
    assert errs.max() < 2e-3, errs
    pt_err = np.linalg.norm(np.asarray(res.pt_pos[:n_pts]) - pts, axis=1)
    assert np.max(pt_err) < 0.01, np.max(pt_err)


def test_local_ba_fixed_cam_untouched(rng):
    prob, poses_true, _, n_cams, _ = build_problem(rng)
    res = local_ba.optimize(prob, K)
    np.testing.assert_array_equal(np.asarray(res.cam_pose[0]), np.asarray(prob.cam_pose[0]))


def test_local_ba_rejects_outliers(rng):
    prob, poses_true, pts, n_cams, n_pts = build_problem(rng, outlier_frac=0.15)
    res = local_ba.optimize(prob, K)
    errs = cam_errors(res, poses_true, n_cams)
    assert errs.max() < 0.03, errs
    # outlier observations must be classified out
    frac_in = float(jnp.sum(res.obs_inlier) / jnp.sum(prob.obs_mask))
    assert 0.7 < frac_in < 0.95


def test_local_ba_mono_only(rng):
    prob, poses_true, pts, n_cams, n_pts = build_problem(rng, stereo=False)
    res = local_ba.optimize(prob, K)
    errs = cam_errors(res, poses_true, n_cams)
    assert errs.max() < 0.02, errs


def test_local_ba_tolerates_behind_camera_init(rng):
    """A landmark initialized BEHIND a camera (possible after loop correction /
    bad triangulation) must not poison the solve: its clamped-1/z residual and
    Jacobian rows are zero-weighted, and the rest converges as usual."""
    prob, poses_true, pts_true, n_cams, _ = build_problem(rng)
    # drag some points behind every camera (z < 0 in all views)
    pt_pos = np.asarray(prob.pt_pos).copy()
    pt_pos[:5] = np.array([0.0, 0.0, -20.0], np.float32)
    prob = prob._replace(pt_pos=jnp.asarray(pt_pos))
    res = local_ba.optimize(prob, K=K)
    err = cam_errors(res, poses_true, 6)
    assert np.isfinite(np.asarray(res.cam_pose)).all()
    # same statistical floor as the clean problem (test_local_ba_reduces_error:
    # 0.3 px noise -> ~9 mm cam floor); without the z-gating the solve is poisoned
    assert err.max() < 0.02, f"behind-camera points poisoned the solve: {err.max()}"
