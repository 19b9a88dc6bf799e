"""DCN map-block sharding (parallel/map_shard.py): covisibility-segment
partition, segment-owned global BA parity with the single-device optimizer,
and the all_to_all point-migration program — all over the simulated 8-device
CPU mesh (SURVEY.md §5.8; the multi-process variant runs in test_multihost.py)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from slam_framework_tpu.optim import global_ba
from slam_framework_tpu.parallel import dist_ba, map_shard

from test_global_ba import K, _build_problem, _cam_err, _make_scene


@pytest.fixture(scope="module")
def mesh(cpu_mesh_devices):
    return Mesh(np.array(cpu_mesh_devices[:8]), ("host",))


def _build_arena(n_cams=8, n_pts=120, seed=4):
    from slam_framework_tpu.config import CameraConfig, CapacityConfig, SlamConfig
    from slam_framework_tpu.map.arena import MapArena

    poses_gt, poses_init, pts, pts_init, obs = _make_scene(
        n_cams=n_cams, n_pts=n_pts, seed=seed
    )
    cam = CameraConfig(fx=K.fx, fy=K.fy, cx=K.cx, cy=K.cy, width=320, height=240,
                       bf=K.bf)
    cfg = SlamConfig(
        camera=cam,
        capacity=CapacityConfig(max_keyframes=16, max_map_points=512,
                                max_features=256),
    )
    arena = MapArena.create(cfg.capacity, 256)
    rngd = np.random.default_rng(0)
    descs = rngd.integers(0, 2**32, (n_pts, 8), dtype=np.uint64).astype(np.uint32)
    pid_of = {}
    obs_by_cam = {}
    for (c, p, u, v, ur) in obs:
        obs_by_cam.setdefault(int(c), []).append((int(p), u, v, ur))
    for c in range(n_cams):
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
                    pts_init[p], descs[p], c,
                    np.array([0, 0, 1.0], np.float32), 0.5, 40.0,
                )
            point_idx[f] = pid_of[p]
        arena.add_keyframe(
            poses_init[c], c, float(c), xy, urr,
            np.full(256, -1.0, np.float32), np.zeros(256, np.int16),
            np.zeros(256, np.float32), desc, valid, point_idx,
        )
    return arena, cfg, poses_gt


class TestPartition:
    def test_segments_are_contiguous_and_cover(self):
        arena, cfg, _ = _build_arena()
        part = map_shard.partition_arena(arena, 4)
        kfs = np.nonzero(arena.kf_valid[: arena.num_kfs])[0]
        segs = part.seg_of_kf[kfs]
        assert segs.min() == 0 and segs.max() <= 3
        assert np.all(np.diff(segs) >= 0), "segments must be contiguous id ranges"
        live_pts = np.nonzero(arena.pt_valid[: arena.num_pts])[0]
        assert np.all(part.owner_of_pt[live_pts] >= 0)

    def test_owner_holds_plurality_of_observations(self):
        arena, cfg, _ = _build_arena()
        part = map_shard.partition_arena(arena, 4)
        pids = np.nonzero(arena.pt_valid[: arena.num_pts])[0]
        for p in pids[:40]:
            kf_obs = arena.pt_obs_kf[p]
            segs = part.seg_of_kf[kf_obs[kf_obs >= 0]]
            counts = np.bincount(segs, minlength=4)
            assert counts[part.owner_of_pt[p]] == counts.max()

    def test_boundary_points_flagged(self):
        arena, cfg, _ = _build_arena()
        part = map_shard.partition_arena(arena, 4)
        s = part.stats()
        # scene points are widely covisible -> plenty of boundary points
        assert s["boundary_points"] > 0
        assert len(s["points_per_segment"]) == 4


class TestSegmentShardedBA:
    def test_matches_single_device(self, mesh):
        poses_gt, poses_init, pts, pts_init, obs = _make_scene()
        prob = _build_problem(poses_init, pts_init, obs, 24, 400)
        res_single = global_ba.optimize_global(prob, K=K)
        # owner-keyed deal with a synthetic (unbalanced) segment assignment
        n_live = int(np.asarray(prob.pt_mask).sum())
        owner = (np.arange(n_live) * 8) // n_live  # contiguous blocks
        sharded = dist_ba.shard_problem(prob, 8, owner=owner)
        res_dist = dist_ba.optimize_global_sharded(sharded, mesh, K)
        err_s = _cam_err(res_single.cam_pose, poses_gt, 24)
        err_d = _cam_err(res_dist.cam_pose, poses_gt, 24)
        assert err_d.max() < 5e-3
        np.testing.assert_allclose(err_d, err_s, atol=2e-3)

    def test_owner_deal_preserves_obs_and_points(self):
        poses_gt, poses_init, pts, pts_init, obs = _make_scene(
            n_cams=8, n_pts=100, seed=7
        )
        prob = _build_problem(poses_init, pts_init, obs, 8, 100)
        n_live = int(np.asarray(prob.pt_mask).sum())
        owner = np.random.default_rng(0).integers(0, 4, n_live)
        sharded = dist_ba.shard_problem(prob, 4, owner=owner)
        assert int(np.asarray(sharded.obs_mask).sum()) == int(np.asarray(prob.obs_mask).sum())
        assert int(np.asarray(sharded.pt_mask).sum()) == int(np.asarray(prob.pt_mask).sum())
        # every point landed on its owner's block
        P_s = sharded.pt_pos.shape[0] // 4
        s_of, lp_of, P_s2 = dist_ba.point_layout(n_live, 4, owner)
        assert P_s == P_s2
        live_pos = np.asarray(prob.pt_pos)[np.asarray(prob.pt_mask)]
        np.testing.assert_allclose(
            np.asarray(sharded.pt_pos)[s_of * P_s + lp_of], live_pos
        )

    def test_arena_end_to_end(self, mesh):
        arena, cfg, poses_gt = _build_arena()
        stats = map_shard.run_global_ba_map_sharded(arena, cfg, K, mesh)
        assert stats["devices"] == 8
        assert stats["segments"] == 8
        err = np.linalg.norm(arena.kf_pose[:8, :3, 3] - poses_gt[:8, :3, 3], axis=1)
        assert err.max() < 2e-2


class TestMigration:
    def test_rows_land_on_new_owner(self, mesh):
        D, R, F = 8, 16, 5
        rng = np.random.default_rng(3)
        rows = rng.normal(size=(D * R, F)).astype(np.float32)
        mask = rng.random(D * R) < 0.7
        new_owner = rng.integers(0, D, D * R).astype(np.int32)
        out_rows, out_mask = map_shard.migrate_points(mesh, rows, mask, new_owner)
        # multiset of live rows per destination block matches expectation
        for d in range(D):
            got = out_rows[d * R : (d + 1) * R][out_mask[d * R : (d + 1) * R]]
            want = rows[mask & (new_owner == d)]
            assert len(got) == len(want)
            key = lambda a: np.lexsort(a.T[::-1])
            np.testing.assert_allclose(got[key(got)], want[key(want)], atol=0)

    def test_overflow_drops_with_mask(self, mesh):
        D, R, F = 8, 4, 3
        rows = np.arange(D * R * F, dtype=np.float32).reshape(D * R, F)
        mask = np.ones(D * R, bool)
        new_owner = np.zeros(D * R, np.int32)  # everyone to slice 0 -> overflow
        out_rows, out_mask = map_shard.migrate_points(mesh, rows, mask, new_owner)
        assert out_mask[:R].sum() == R          # slice 0 filled to capacity
        assert out_mask[R:].sum() == 0          # nothing anywhere else
