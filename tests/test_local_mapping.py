"""LocalMapper triangulation + keyframe culling tests (pipeline/mapping_ops.py,
pipeline/local_mapper.py).

Mirrors LocalMapper::CreateNewMapPoints (reference: src/core/local_mapper.cpp:258-492)
and KeyFrameCulling (:556-613) on synthetic geometry with exact ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_framework_tpu.config import CameraConfig, CapacityConfig, SlamConfig
from slam_framework_tpu.geometry.projection import Intrinsics
from slam_framework_tpu.map.arena import MapArena
from slam_framework_tpu.pipeline import mapping_ops
from slam_framework_tpu.pipeline.local_mapper import LocalMapper

FX = FY = 300.0
CX, CY = 160.0, 120.0
K = Intrinsics(fx=FX, fy=FY, cx=CX, cy=CY, bf=60.0)
N = 128


def _pose(tx):
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -tx  # camera at x=tx looking down +z
    return T


def _project(T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], 1)
    return uv.astype(np.float32), pc[:, 2].astype(np.float32)


@pytest.fixture
def scene(rng):
    pts = np.stack(
        [rng.uniform(-3, 3, 64), rng.uniform(-2, 2, 64), rng.uniform(6, 14, 64)], 1
    ).astype(np.float32)
    descs = rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32)
    return pts, descs


def _block(T, pts, descs, cand=True):
    uv, z = _project(T, pts)
    n = len(pts)
    pad = N - n
    return mapping_ops.KFBlock(
        pose=jnp.asarray(T),
        xy=jnp.asarray(np.pad(uv, ((0, pad), (0, 0)))),
        ur=jnp.asarray(np.full(N, -1.0, np.float32)),
        octave=jnp.asarray(np.zeros(N, np.int32)),
        angle=jnp.asarray(np.zeros(N, np.float32)),
        desc=jnp.asarray(np.pad(descs, ((0, pad), (0, 0)))),
        cand=jnp.asarray(np.arange(N) < (n if cand else 0)),
    )


class TestTriangulation:
    def test_recovers_geometry(self, scene):
        pts, descs = scene
        cur = _block(_pose(0.0), pts, descs)
        nbr = _block(_pose(1.0), pts, descs)
        nbrs = jax.tree.map(lambda *x: jnp.stack(x), nbr)
        res = mapping_ops.triangulate_with_neighbors(
            cur, nbrs, jnp.float32(0.1), K=K, num_levels=4, scale_factor=1.2
        )
        valid = np.asarray(res.valid[0])
        est = np.asarray(res.pts[0])
        assert valid[:64].sum() > 50, f"only {valid[:64].sum()} triangulated"
        err = np.linalg.norm(est[:64][valid[:64]] - pts[valid[:64]], axis=1)
        assert err.max() < 0.05

    def test_baseline_gate(self, scene):
        pts, descs = scene
        cur = _block(_pose(0.0), pts, descs)
        nbr = _block(_pose(0.005), pts, descs)  # nearly identical viewpoint
        nbrs = jax.tree.map(lambda *x: jnp.stack(x), nbr)
        res = mapping_ops.triangulate_with_neighbors(
            cur, nbrs, jnp.float32(0.1), K=K, num_levels=4, scale_factor=1.2
        )
        assert int(np.asarray(res.valid).sum()) == 0

    def test_mapper_creates_far_points(self, scene, rng):
        """Unassociated (depth-less) features get triangulated into new points."""
        pts, descs = scene
        cfg = SlamConfig(
            camera=CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240, bf=60.0),
            capacity=CapacityConfig(max_keyframes=8, max_map_points=512, max_features=N),
        )
        arena = MapArena.create(cfg.capacity, N)
        for tx in (0.0, 1.0):
            T = _pose(tx)
            uv, z = _project(T, pts)
            xy = np.zeros((N, 2), np.float32)
            xy[:64] = uv
            desc = np.zeros((N, 8), np.uint32)
            desc[:64] = descs
            valid = np.arange(N) < 64
            arena.add_keyframe(
                T, int(tx), float(tx), xy, np.full(N, -1.0, np.float32),
                np.full(N, -1.0, np.float32), np.zeros(N, np.int16),
                np.zeros(N, np.float32), desc, valid, np.full(N, -1, np.int32),
            )
        # seed covisibility: a few shared associated points so KFs are neighbors
        for j in range(20):
            pid = arena.add_point(pts[j], descs[j], 0, np.array([0, 0, 1.0], np.float32), 1.0, 30.0)
            arena.associate(0, j, pid)
            arena.associate(1, j, pid)
        mapper = LocalMapper(cfg, arena, K)
        before = arena.n_valid_pts
        tri = mapper._dispatch_triangulation(1)
        assert tri is not None
        mapper._apply_triangulation(1, *tri)
        created = arena.n_valid_pts - before
        assert created > 30, f"only {created} new points"
        # created points near ground truth
        new_pids = np.nonzero(arena.pt_valid[: arena.num_pts])[0][before:]
        feats = arena.pt_obs_feat[new_pids, 0]
        err = np.linalg.norm(arena.pt_pos[new_pids] - pts[feats], axis=1)
        assert np.median(err) < 0.05


class TestSearchInNeighbors:
    def test_fuse_adds_observations_and_merges(self, scene):
        """SearchInNeighbors (local_mapper.cpp:494-554): projecting a keyframe's
        points into covisible neighbors adds confirming observations on free
        features and merges duplicate landmarks on bound ones."""
        pts, descs = scene
        cfg = SlamConfig(
            camera=CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240, bf=60.0),
            capacity=CapacityConfig(max_keyframes=8, max_map_points=512, max_features=N),
        )
        arena = MapArena.create(cfg.capacity, N)
        for i, tx in enumerate((0.0, 0.5)):
            T = _pose(tx)
            uv, _ = _project(T, pts)
            xy = np.zeros((N, 2), np.float32)
            xy[:64] = uv
            desc = np.zeros((N, 8), np.uint32)
            desc[:64] = descs
            valid = np.arange(N) < 64
            arena.add_keyframe(
                T, i, float(i), xy, np.full(N, -1.0, np.float32),
                np.full(N, -1.0, np.float32), np.zeros(N, np.int16),
                np.zeros(N, np.float32), desc, valid, np.full(N, -1, np.int32),
            )
        # kf1 owns a point per feature; the first 20 are shared with kf0
        # (covisibility seed). Scale range anchored at the true distance so the
        # predicted level is 0 (matches the stored octave-0 features).
        pids = []
        for j in range(64):
            d = float(np.linalg.norm(pts[j]))
            pid = arena.add_point(
                pts[j], descs[j], 1, (pts[j] / d).astype(np.float32), 0.5 * d, d
            )
            arena.associate(1, j, pid)
            if j < 20:
                arena.associate(0, j, pid)
            pids.append(pid)
        # a duplicate landmark of point 30, bound to kf0's feature 30
        d30 = float(np.linalg.norm(pts[30]))
        dup = arena.add_point(
            pts[30] + 0.001, descs[30], 0,
            (pts[30] / d30).astype(np.float32), 0.5 * d30, d30,
        )
        arena.associate(0, 30, dup)

        mapper = LocalMapper(cfg, arena, K)
        mapper._search_in_neighbors(1)

        assert mapper.last_fuse["added_obs"] > 30
        assert mapper.last_fuse["merged"] >= 1
        # free kf0 features now observe kf1's points
        added = [j for j in range(20, 64) if j != 30 and arena.kf_point_idx[0, j] >= 0]
        assert len(added) > 30
        for j in added[:5]:
            assert arena.kf_point_idx[0, j] == pids[j]
            assert arena.pt_obs_count[pids[j]] == 2
        # the duplicate pair was merged into one surviving point seen by both KFs
        survivors = [p for p in (pids[30], dup) if arena.pt_valid[p]]
        assert len(survivors) == 1
        s = survivors[0]
        assert arena.kf_point_idx[0, 30] == s and arena.kf_point_idx[1, 30] == s
        obs_kfs = set(arena.pt_obs_kf[s, : int(arena.pt_obs_count[s])].tolist())
        assert obs_kfs == {0, 1}


class TestKeyFrameCulling:
    def test_redundant_kf_erased(self, scene):
        pts, descs = scene
        from slam_framework_tpu.config import MappingConfig

        cfg = SlamConfig(
            camera=CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240, bf=60.0),
            capacity=CapacityConfig(max_keyframes=8, max_map_points=512, max_features=N),
            mapping=MappingConfig(kf_cull_min_age=1),
        )
        arena = MapArena.create(cfg.capacity, N)
        # 4 keyframes all observing the same 64 points at octave 0 -> middle ones redundant
        for i, tx in enumerate((0.0, 0.3, 0.6, 0.9)):
            T = _pose(tx)
            uv, _ = _project(T, pts)
            xy = np.zeros((N, 2), np.float32)
            xy[:64] = uv
            desc = np.zeros((N, 8), np.uint32)
            desc[:64] = descs
            valid = np.arange(N) < 64
            arena.add_keyframe(
                T, i, float(i), xy, np.full(N, -1.0, np.float32),
                np.full(N, -1.0, np.float32), np.zeros(N, np.int16),
                np.zeros(N, np.float32), desc, valid, np.full(N, -1, np.int32),
            )
        pids = []
        for j in range(64):
            pid = arena.add_point(pts[j], descs[j], 0, np.array([0, 0, 1.0], np.float32), 1.0, 30.0)
            pids.append(pid)
            for k in range(4):
                arena.associate(k, j, pid)
        mapper = LocalMapper(cfg, arena, K)
        erased = []
        mapper.on_erase_keyframe = erased.append
        before = arena.n_valid_kfs
        mapper._cull_keyframes(3)
        assert arena.n_valid_kfs < before
        assert erased and all(k not in (0, 3) for k in erased)
        # observations of erased KFs removed from points
        for k in erased:
            assert not (arena.pt_obs_kf[np.asarray(pids)] == k).any()


def test_mapper_programs_run_on_secondary_device(scene):
    """Pipelined dataflow: with >1 device, the mapper's async programs live on
    device[mapping.device_index] so they never contend with the tracker chip."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    pts, descs = scene
    cfg = SlamConfig(
        camera=CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240, bf=60.0),
        capacity=CapacityConfig(max_keyframes=8, max_map_points=512, max_features=N),
    )
    arena = MapArena.create(cfg.capacity, N)
    for tx in (0.0, 1.0):
        T = _pose(tx)
        uv, _ = _project(T, pts)
        xy = np.zeros((N, 2), np.float32); xy[:64] = uv
        desc = np.zeros((N, 8), np.uint32); desc[:64] = descs
        valid = np.arange(N) < 64
        arena.add_keyframe(
            T, int(tx), float(tx), xy, np.full(N, -1.0, np.float32),
            np.full(N, -1.0, np.float32), np.zeros(N, np.int16),
            np.zeros(N, np.float32), desc, valid, np.full(N, -1, np.int32),
        )
    for j in range(20):
        pid = arena.add_point(pts[j], descs[j], 0, np.array([0, 0, 1.0], np.float32), 1.0, 30.0)
        arena.associate(0, j, pid)
        arena.associate(1, j, pid)
    mapper = LocalMapper(cfg, arena, K)
    assert mapper.device == jax.devices()[cfg.mapping.device_index]
    tri = mapper._dispatch_triangulation(1)
    assert tri is not None
    _, res = tri
    assert res.pts.devices() == {mapper.device}
    mapper._apply_triangulation(1, *tri)  # cross-device fetch works


class TestWritebackPolicy:
    """config.MappingConfig.{ba,trifuse}_writeback: the pending-write-back
    policy at keyframe arrival (reference abort semantics:
    LocalMapper::InsertKeyFrame -> abort_bundle_adjustment_,
    local_mapper.cpp:89-93)."""

    def _arena_with_two_kfs(self, scene, mapping_cfg):
        pts, descs = scene
        from slam_framework_tpu.config import MappingConfig

        cfg = SlamConfig(
            camera=CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240, bf=60.0),
            capacity=CapacityConfig(max_keyframes=8, max_map_points=512, max_features=N),
            mapping=mapping_cfg,
        )
        arena = MapArena.create(cfg.capacity, N)
        for tx in (0.0, 1.0):
            T = _pose(tx)
            uv, _ = _project(T, pts)
            xy = np.zeros((N, 2), np.float32); xy[:64] = uv
            desc = np.zeros((N, 8), np.uint32); desc[:64] = descs
            valid = np.arange(N) < 64
            arena.add_keyframe(
                T, int(tx), float(tx), xy, np.full(N, -1.0, np.float32),
                np.full(N, -1.0, np.float32), np.zeros(N, np.int16),
                np.zeros(N, np.float32), desc, valid, np.full(N, -1, np.int32),
            )
        for j in range(40):
            pid = arena.add_point(pts[j], descs[j], 0, np.array([0, 0, 1.0], np.float32), 1.0, 30.0)
            arena.associate(0, j, pid)
            arena.associate(1, j, pid)
        return cfg, arena

    def test_discard_drops_inflight_ba(self, scene):
        from slam_framework_tpu.config import MappingConfig

        cfg, arena = self._arena_with_two_kfs(
            scene, MappingConfig(ba_writeback="discard", triangulate_new_points=False,
                                 cull_keyframes=False))
        mapper = LocalMapper(cfg, arena, K)
        mapper._local_ba(1)  # in-flight BA, as if dispatched at the previous KF
        assert mapper._ba_pendings
        mapper.process_keyframe(1)  # new KF arrives, nothing prefetched
        assert mapper.ba_aborts == 1
        # the new dispatch from THIS keyframe is pending; the old one was dropped
        assert len(mapper._ba_pendings) == 1

    def test_trifuse_lag_rides_to_next_drain(self, scene):
        from slam_framework_tpu.config import MappingConfig

        cfg, arena = self._arena_with_two_kfs(
            scene, MappingConfig(ba_writeback="block", trifuse_writeback="lag",
                                 triangulate_new_points=False, cull_keyframes=False))
        mapper = LocalMapper(cfg, arena, K)
        pending = mapper._dispatch_fuse(1)
        assert pending is not None
        mapper._fuse_pending.append(pending)
        mapper.process_keyframe(1)  # nothing prefetched: lag keeps it in flight
        assert mapper._fuse_pending and mapper._fuse_pending[0] is pending
        mapper.finalize()  # next drain (or shutdown) lands it
        assert not mapper._fuse_pending

    def test_block_applies_inflight_ba(self, scene):
        from slam_framework_tpu.config import MappingConfig

        cfg, arena = self._arena_with_two_kfs(
            scene, MappingConfig(ba_writeback="block", triangulate_new_points=False,
                                 cull_keyframes=False))
        mapper = LocalMapper(cfg, arena, K)
        mapper._local_ba(1)
        mapper.process_keyframe(1)
        assert mapper.ba_aborts == 0
        assert mapper.last_ba_stats.get("cams", 0) >= 2  # the old BA landed
