"""Distributed Schur BA over the simulated 8-device CPU mesh (parallel/dist_ba.py).

SURVEY.md §4 requirement: multi-host logic exercised without a pod via
xla_force_host_platform_device_count. The sharded solver must reproduce the
single-device global-BA solution (same math, reductions via psum)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.optim import global_ba
from slam_framework_tpu.parallel import dist_ba

from test_global_ba import K, _build_problem, _cam_err, _make_scene


@pytest.fixture(scope="module")
def mesh(cpu_mesh_devices):
    return Mesh(np.array(cpu_mesh_devices[:8]), ("ba",))


class TestDistributedBA:
    def test_matches_single_device(self, mesh):
        poses_gt, poses_init, pts, pts_init, obs = _make_scene()
        prob = _build_problem(poses_init, pts_init, obs, 24, 400)

        res_single = global_ba.optimize_global(prob, K=K)
        sharded = dist_ba.shard_problem(prob, 8)
        res_dist = dist_ba.optimize_global_sharded(sharded, mesh, K)

        err_s = _cam_err(res_single.cam_pose, poses_gt, 24)
        err_d = _cam_err(res_dist.cam_pose, poses_gt, 24)
        assert err_d.max() < 5e-3, f"distributed BA err {err_d.max():.4f}"
        # same optimum (CG paths differ slightly in reduction order)
        np.testing.assert_allclose(err_d, err_s, atol=2e-3)

    def test_shard_partition_covers_all_obs(self):
        poses_gt, poses_init, pts, pts_init, obs = _make_scene(n_cams=8, n_pts=100, seed=7)
        prob = _build_problem(poses_init, pts_init, obs, 8, 100)
        sharded = dist_ba.shard_problem(prob, 4)
        assert int(np.asarray(sharded.obs_mask).sum()) == int(np.asarray(prob.obs_mask).sum())
        assert int(np.asarray(sharded.pt_mask).sum()) == int(np.asarray(prob.pt_mask).sum())

    def test_arena_roundtrip_dist(self, mesh):
        """run_global_ba_dist write-back equals ground truth on the tiny arena."""
        from slam_framework_tpu.config import CameraConfig, CapacityConfig, SlamConfig
        from slam_framework_tpu.map.arena import MapArena

        poses_gt, poses_init, pts, pts_init, obs = _make_scene(n_cams=8, n_pts=120, seed=4)
        cam = CameraConfig(fx=K.fx, fy=K.fy, cx=K.cx, cy=K.cy, width=320, height=240, bf=K.bf)
        cfg = SlamConfig(
            camera=cam,
            capacity=CapacityConfig(max_keyframes=16, max_map_points=512, max_features=256),
        )
        arena = MapArena.create(cfg.capacity, 256)
        rngd = np.random.default_rng(0)
        descs = rngd.integers(0, 2**32, (120, 8), dtype=np.uint64).astype(np.uint32)
        pid_of = {}
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
        stats = dist_ba.run_global_ba_dist(arena, cfg, K, mesh)
        assert stats["devices"] == 8
        err = np.linalg.norm(arena.kf_pose[:8, :3, 3] - poses_gt[:8, :3, 3], axis=1)
        assert err.max() < 2e-2
