"""Loop-closer integration test (pipeline/loop_closer.py).

Synthetic two-lap scenario mirroring the reference's loop-closing behavior
(src/core/loop_closer.cpp): a camera drives the same circle twice; the second lap's
keyframes and landmarks carry a rigid drift (re-triangulated in a drifted frame, same
descriptors). The loop closer must (1) detect the revisit via BoW + consistency
voting, (2) solve the relative Sim3, (3) correct the second lap's poses/points via
Sim3 propagation + essential-graph optimization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_framework_tpu.bow import vocabulary
from slam_framework_tpu.config import CameraConfig, CapacityConfig, SlamConfig
from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.map.arena import MapArena
from slam_framework_tpu.pipeline.loop_closer import LoopCloser

N_PER_LAP = 12
RADIUS = 10.0
N_LANDMARKS = 360


def _gt_pose(k):
    """Tcw for camera k on the circle, looking along the tangent."""
    a = 2 * np.pi * k / N_PER_LAP
    center = np.array([RADIUS * np.cos(a), RADIUS * np.sin(a), 0.0])
    fwd = np.array([-np.sin(a), np.cos(a), 0.0])
    up = np.array([0.0, 0.0, -1.0])
    left = np.cross(up, fwd)
    Twc = np.eye(4)
    Twc[:3, :3] = np.stack([left, up, fwd], axis=1)
    Twc[:3, 3] = center
    return np.linalg.inv(Twc).astype(np.float32)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(5)
    ang = 2 * np.pi * np.arange(N_LANDMARKS) / N_LANDMARKS
    r = 13.0 + rng.uniform(-0.5, 0.5, N_LANDMARKS)
    pts = np.stack(
        [r * np.cos(ang), r * np.sin(ang), rng.uniform(-1.0, 1.0, N_LANDMARKS)], axis=1
    ).astype(np.float32)
    descs = rng.integers(0, 2**32, (N_LANDMARKS, 8), dtype=np.uint64).astype(np.uint32)
    return pts, descs


def _build_two_lap_arena(world, drift_t=(0.8, 0.5, 0.0), drift_rot=0.04):
    """Lap 1 = ground truth; lap 2 = same trajectory estimated in a drifted frame W
    (poses T_gt @ W^-1, points W(p)), so reprojections stay self-consistent."""
    pts_w, descs = world
    cam = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240, bf=40.0)
    cfg = SlamConfig(
        camera=cam,
        capacity=CapacityConfig(
            max_keyframes=64, max_map_points=8192, max_features=256,
            local_window_points=1024, ba_cams=16, ba_points=512, ba_obs=2048,
        ),
    )
    K = Intrinsics(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf)

    ca, sa = np.cos(drift_rot), np.sin(drift_rot)
    W = np.eye(4, dtype=np.float64)
    W[:3, :3] = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]])
    W[:3, 3] = drift_t

    arena = MapArena.create(cfg.capacity, 256)
    lap_pid = {}  # (lap, landmark) -> arena pid
    gt_poses = []
    for k in range(2 * N_PER_LAP):
        lap = k // N_PER_LAP
        T_gt = _gt_pose(k % N_PER_LAP).astype(np.float64)
        gt_poses.append(T_gt.astype(np.float32))
        pose_est = (T_gt @ np.linalg.inv(W)).astype(np.float32) if lap else T_gt.astype(np.float32)
        # visible landmarks under the TRUE geometry
        pc = pts_w @ T_gt[:3, :3].T + T_gt[:3, 3]
        uv = np.stack(
            [cam.fx * pc[:, 0] / np.maximum(pc[:, 2], 1e-6) + cam.cx,
             cam.fy * pc[:, 1] / np.maximum(pc[:, 2], 1e-6) + cam.cy], axis=1
        )
        vis = (pc[:, 2] > 1.0) & (pc[:, 2] < 15.0) & (uv[:, 0] >= 8) & (
            uv[:, 0] < cam.width - 8) & (uv[:, 1] >= 8) & (uv[:, 1] < cam.height - 8)
        lm_ids = np.nonzero(vis)[0][:256]
        n = len(lm_ids)
        xy = np.zeros((256, 2), np.float32)
        xy[:n] = uv[lm_ids]
        depth = np.full(256, -1.0, np.float32)
        depth[:n] = pc[lm_ids, 2]
        ur = np.full(256, -1.0, np.float32)
        ur[:n] = xy[:n, 0] - cam.bf / np.maximum(depth[:n], 1e-6)
        desc = np.zeros((256, 8), np.uint32)
        desc[:n] = descs[lm_ids]
        valid = np.zeros(256, bool)
        valid[:n] = True
        point_idx = np.full(256, -1, np.int32)
        # create or link points (per lap; lap-2 points live in the drifted frame)
        for f, lm in enumerate(lm_ids):
            key = (lap, lm)
            if key not in lap_pid:
                p_world = pts_w[lm].astype(np.float64)
                p_stored = (W[:3, :3] @ p_world + W[:3, 3]) if lap else p_world
                pid = arena.add_point(
                    p_stored.astype(np.float32), descs[lm], k,
                    np.array([0.0, 0.0, 1.0], np.float32), 0.5, 40.0,
                )
                lap_pid[key] = pid
            point_idx[f] = lap_pid[key]
        arena.add_keyframe(
            pose_est, k, float(k), xy, ur, depth,
            np.zeros(256, np.int16), np.zeros(256, np.float32), desc, valid, point_idx,
        )
    return cfg, K, arena, np.stack(gt_poses)


def _center_errors(arena, gt_poses, ids):
    T = arena.kf_pose[ids]
    c = -np.einsum("nji,nj->ni", T[:, :3, :3], T[:, :3, 3])
    gt = gt_poses[ids]
    cg = -np.einsum("nji,nj->ni", gt[:, :3, :3], gt[:, :3, 3])
    return np.linalg.norm(c - cg, axis=1)


class TestLoopCloser:
    def test_two_lap_loop_closure(self, world):
        cfg, K, arena, gt_poses = _build_two_lap_arena(world)
        vocab = vocabulary.train(world[1], k=6, depth=3, seed=0)
        closer = LoopCloser(cfg, arena, K, vocab)

        lap2 = np.arange(N_PER_LAP, 2 * N_PER_LAP)
        err_before = _center_errors(arena, gt_poses, lap2)
        assert err_before.max() > 0.5  # the drift is real

        closed_at = None
        for k in range(arena.num_kfs):
            if closer.process_keyframe(k):
                closed_at = k
                break
        assert closed_at is not None, f"no loop closed; last report: {closer.last_report}"
        assert closed_at >= N_PER_LAP  # must close on a second-lap keyframe

        err_after = _center_errors(arena, gt_poses, lap2[: closed_at - N_PER_LAP + 1])
        assert err_after.max() < 0.15, (
            f"loop closure left {err_after.max():.3f} m error (was {err_before.max():.3f})"
        )

    def test_no_false_loop_on_single_lap(self, world):
        """First lap alone (all distinct views) must not trigger a closure."""
        cfg, K, arena, _ = _build_two_lap_arena(world)
        vocab = vocabulary.train(world[1], k=6, depth=3, seed=0)
        closer = LoopCloser(cfg, arena, K, vocab)
        for k in range(N_PER_LAP):
            assert not closer.process_keyframe(k)

    def test_async_global_ba_merges_later(self, world):
        """RunGlobalBundleAdjustment is async (loop_closer.cpp:73-172): the GBA
        dispatched at loop closure is merged at a later apply_pending_gba() call,
        with keyframes/points outside the problem corrected through their
        covisible parents."""
        cfg, K, arena, gt_poses = _build_two_lap_arena(world)
        vocab = vocabulary.train(world[1], k=6, depth=3, seed=0)
        closer = LoopCloser(cfg, arena, K, vocab)
        closed_at = None
        for k in range(arena.num_kfs):
            if closer.process_keyframe(k):
                closed_at = k
                break
        assert closed_at is not None
        assert closer._gba_pending is not None, "GBA should be in flight"
        assert closer.apply_pending_gba()
        assert closer._gba_pending is None
        assert "gba" in closer.last_report
        assert np.isfinite(closer.last_report["gba"]["chi2"])
        # applying must not degrade the corrected trajectory
        lap2 = np.arange(N_PER_LAP, N_PER_LAP + (closed_at - N_PER_LAP + 1))
        err = _center_errors(arena, gt_poses, lap2)
        assert err.max() < 0.15, f"GBA merge degraded the loop correction: {err.max():.3f}"
        # second apply is a no-op
        assert not closer.apply_pending_gba()
