"""Global BA tests (optim/global_ba.py): matrix-free Schur CG vs. known geometry.

Mirrors Optimizer::GlobalBundleAdjustemnt semantics (reference:
src/optimizer/optimizer.cpp:18-207): all cameras + points, first keyframe fixed,
Huber-robust two-phase schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_framework_tpu.config import CameraConfig, CapacityConfig, SlamConfig
from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.map.arena import MapArena
from slam_framework_tpu.optim import global_ba

FX = FY = 200.0
CX, CY = 160.0, 120.0
BF = 40.0
K = Intrinsics(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF)


def _make_scene(n_cams=24, n_pts=400, seed=0, pose_noise=0.03, pt_noise=0.05):
    """Cameras on an arc looking at a point cloud; noisy initial estimates,
    exact observations."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-6, 6, n_pts), rng.uniform(-4, 4, n_pts), rng.uniform(8, 16, n_pts)],
        axis=1,
    ).astype(np.float32)
    poses_gt = []
    for k in range(n_cams):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.25 * k - 3.0, 0.1 * np.sin(k), 0.0]
        a = 0.02 * (k - n_cams / 2)
        ca, sa = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        poses_gt.append(T)
    poses_gt = np.stack(poses_gt)

    obs = []
    for c in range(n_cams):
        pc = pts @ poses_gt[c, :3, :3].T + poses_gt[c, :3, 3]
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], 1)
        vis = (pc[:, 2] > 1) & (uv[:, 0] > 0) & (uv[:, 0] < 320) & (uv[:, 1] > 0) & (uv[:, 1] < 240)
        for p in np.nonzero(vis)[0]:
            ur = uv[p, 0] - BF / pc[p, 2]
            obs.append((c, p, uv[p, 0], uv[p, 1], ur))
    obs = np.array(obs, np.float64)

    # noisy initial estimates (first camera exact: it is the gauge anchor)
    poses_init = poses_gt.copy()
    for c in range(1, n_cams):
        dt = rng.normal(0, pose_noise, 3)
        poses_init[c, :3, 3] += dt
    pts_init = pts + rng.normal(0, pt_noise, pts.shape).astype(np.float32)
    return poses_gt, poses_init, pts, pts_init, obs


def _build_problem(poses_init, pts_init, obs, n_cams, n_pts, fix0=True):
    C = global_ba._next_pow2(n_cams)
    P = global_ba._next_pow2(n_pts)
    m = len(obs)
    M = global_ba._next_pow2(m)
    O = 32
    obs_cam = np.zeros(M, np.int32)
    obs_pt = np.zeros(M, np.int32)
    obs_uv = np.zeros((M, 2), np.float32)
    obs_ur = np.full(M, -1.0, np.float32)
    obs_mask = np.zeros(M, bool)
    obs_cam[:m] = obs[:, 0]
    obs_pt[:m] = obs[:, 1]
    obs_uv[:m] = obs[:, 2:4]
    obs_ur[:m] = obs[:, 4]
    obs_mask[:m] = True

    pt_slots = np.full((P, O), -1, np.int32)
    fill = np.zeros(P, np.int32)
    cam_counts = np.bincount(obs_cam[:m], minlength=C)
    Oc = global_ba._next_pow2(int(cam_counts.max()))
    cam_slots = np.full((C, Oc), -1, np.int32)
    cfill = np.zeros(C, np.int32)
    for i in range(m):
        p = obs_pt[i]
        if fill[p] < O:
            pt_slots[p, fill[p]] = i
            fill[p] += 1
        c = obs_cam[i]
        cam_slots[c, cfill[c]] = i
        cfill[c] += 1

    cam_pose = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    cam_pose[:n_cams] = poses_init
    cam_fixed = np.ones(C, bool)
    cam_fixed[:n_cams] = False
    if fix0:
        cam_fixed[0] = True
    cam_mask = np.zeros(C, bool)
    cam_mask[:n_cams] = True
    pt_pos = np.zeros((P, 3), np.float32)
    pt_pos[:n_pts] = pts_init
    pt_mask = np.zeros(P, bool)
    pt_mask[:n_pts] = True

    return global_ba.GlobalBAProblem(
        cam_pose=jnp.asarray(cam_pose),
        cam_fixed=jnp.asarray(cam_fixed),
        cam_mask=jnp.asarray(cam_mask),
        pt_pos=jnp.asarray(pt_pos),
        pt_mask=jnp.asarray(pt_mask),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.asarray(np.ones(M, np.float32)),
        obs_mask=jnp.asarray(obs_mask),
        pt_obs_slots=jnp.asarray(pt_slots),
        cam_obs_slots=jnp.asarray(cam_slots),
    )


def _cam_err(cam_pose, poses_gt, n):
    T = np.asarray(cam_pose)[:n]
    return np.linalg.norm(T[:, :3, 3] - poses_gt[:n, :3, 3], axis=1)


class TestGlobalBA:
    def test_converges_to_ground_truth(self):
        poses_gt, poses_init, pts, pts_init, obs = _make_scene()
        prob = _build_problem(poses_init, pts_init, obs, 24, 400)
        err0 = _cam_err(prob.cam_pose, poses_gt, 24).max()
        res = global_ba.optimize_global(prob, K=K)
        err1 = _cam_err(res.cam_pose, poses_gt, 24).max()
        assert err0 > 0.02
        assert err1 < 5e-3, f"global BA left {err1:.4f} m camera error (init {err0:.4f})"
        pt_err = np.linalg.norm(np.asarray(res.pt_pos)[:400] - pts, axis=1)
        assert np.median(pt_err) < 5e-3

    def test_outliers_rejected(self):
        poses_gt, poses_init, pts, pts_init, obs = _make_scene(seed=1)
        rng = np.random.default_rng(2)
        # corrupt 5% of observations with gross errors
        n_bad = len(obs) // 20
        bad = rng.choice(len(obs), n_bad, replace=False)
        obs[bad, 2:4] += rng.uniform(30, 80, (n_bad, 2)) * rng.choice([-1, 1], (n_bad, 2))
        prob = _build_problem(poses_init, pts_init, obs, 24, 400)
        res = global_ba.optimize_global(prob, K=K)
        inlier = np.asarray(res.obs_inlier)[: len(obs)]
        # most corrupted obs classified out; solution still accurate
        assert inlier[bad].mean() < 0.2
        err1 = _cam_err(res.cam_pose, poses_gt, 24).max()
        assert err1 < 2e-2

    def test_mono_observations(self):
        """ur < 0 rows use the 2-dof mono residual (optimizer.cpp:120-160)."""
        poses_gt, poses_init, pts, pts_init, obs = _make_scene(seed=3)
        obs[:, 4] = -1.0  # all mono
        prob = _build_problem(poses_init, pts_init, obs, 24, 400)
        res = global_ba.optimize_global(prob, K=K)
        err1 = _cam_err(res.cam_pose, poses_gt, 24).max()
        assert err1 < 2e-2

    def test_arena_roundtrip(self):
        """build_global_problem + run_global_ba write-back on a tiny arena."""
        poses_gt, poses_init, pts, pts_init, obs = _make_scene(n_cams=8, n_pts=120, seed=4)
        cam = CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240, bf=BF)
        cfg = SlamConfig(
            camera=cam,
            capacity=CapacityConfig(max_keyframes=16, max_map_points=512, max_features=256),
        )
        arena = MapArena.create(cfg.capacity, 256)
        pid_of = {}
        rngd = np.random.default_rng(0)
        descs = rngd.integers(0, 2**32, (120, 8), dtype=np.uint64).astype(np.uint32)
        obs_by_cam = {}
        for (c, p, u, v, ur) in obs:
            obs_by_cam.setdefault(int(c), []).append((int(p), u, v, ur))
        for c in range(8):
            rows = obs_by_cam[c][:256]
            xy = np.zeros((256, 2), np.float32)
            urr = np.full(256, -1.0, np.float32)
            desc = np.zeros((256, 8), np.uint32)
            valid = np.zeros(256, bool)
            point_idx = np.full(256, -1, np.int32)
            for f, (p, u, v, ur) in enumerate(rows):
                xy[f] = (u, v)
                urr[f] = ur
                desc[f] = descs[p]
                valid[f] = True
                if p not in pid_of:
                    pid_of[p] = arena.add_point(
                        pts_init[p], descs[p], c, np.array([0, 0, 1.0], np.float32), 0.5, 40.0
                    )
                point_idx[f] = pid_of[p]
            arena.add_keyframe(
                poses_init[c], c, float(c), xy, urr, np.full(256, -1.0, np.float32),
                np.zeros(256, np.int16), np.zeros(256, np.float32), desc, valid, point_idx,
            )
        stats = global_ba.run_global_ba(arena, cfg, K)
        assert stats["cams"] == 8
        err = np.linalg.norm(
            arena.kf_pose[:8, :3, 3] - poses_gt[:8, :3, 3], axis=1
        )
        assert err.max() < 2e-2
