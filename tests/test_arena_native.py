"""Parity: native (C++) arena observation ops vs the pure-numpy fallback.

The native module (slam_framework_tpu/native/arena_ops.cpp) replaces the
reference's C++ map bookkeeping hot loops (src/data/map_point.cpp:114-226,
src/data/keyframe.cpp:190-275). Both paths must produce identical observation
tables for any op sequence.
"""

import numpy as np
import pytest

from slam_framework_tpu import native
from slam_framework_tpu.config import CapacityConfig
from slam_framework_tpu.map.arena import MapArena

N = 64
CAP = CapacityConfig(max_keyframes=16, max_map_points=256, max_features=N, max_obs_per_point=8)


def _random_run(arena: MapArena, rng: np.random.Generator) -> None:
    """A randomized but deterministic op sequence exercising every wired path."""
    pids = []
    for j in range(100):
        pid = arena.add_point(
            rng.normal(size=3).astype(np.float32),
            rng.integers(0, 2**32, 8, dtype=np.uint64).astype(np.uint32),
            0, np.array([0, 0, 1.0], np.float32), 1.0, 30.0,
        )
        pids.append(pid)
    for k in range(8):
        point_idx = np.full(N, -1, np.int32)
        picks = rng.permutation(100)[:40]
        point_idx[rng.permutation(N)[:40]] = np.asarray(pids, np.int32)[picks]
        arena.add_keyframe(
            np.eye(4, dtype=np.float32), k, float(k),
            np.zeros((N, 2), np.float32), np.full(N, -1.0, np.float32),
            np.full(N, -1.0, np.float32), np.zeros(N, np.int16),
            np.zeros(N, np.float32), np.zeros((N, 8), np.uint32),
            np.ones(N, bool), point_idx,
        )
    for a, b in [(0, 1), (5, 9), (20, 21), (50, 3)]:
        arena.merge_points(a, b)
    arena.erase_keyframe(2)
    arena.erase_keyframe(5)


def _snapshot(arena: MapArena) -> dict:
    return {
        "kf_point_idx": arena.kf_point_idx.copy(),
        "obs_count": arena.pt_obs_count.copy(),
        "n_visible": arena.pt_n_visible.copy(),
        "n_found": arena.pt_n_found.copy(),
        "pt_valid": arena.pt_valid.copy(),
        # obs slots as sets (slot order differs after erase-compaction paths)
        "obs_sets": [
            set(zip(arena.pt_obs_kf[p, : arena.pt_obs_count[p]].tolist(),
                    arena.pt_obs_feat[p, : arena.pt_obs_count[p]].tolist()))
            for p in range(arena.num_pts)
        ],
    }


def test_native_lib_builds():
    assert native.load_arena_ops() is not None, "native arena ops failed to compile"


def test_native_matches_numpy(monkeypatch):
    rng1 = np.random.default_rng(7)
    a_native = MapArena.create(CAP, N)
    assert native.load_arena_ops() is not None
    _random_run(a_native, rng1)

    monkeypatch.setattr(native, "load_arena_ops", lambda: None)
    rng2 = np.random.default_rng(7)
    a_np = MapArena.create(CAP, N)
    _random_run(a_np, rng2)

    s1, s2 = _snapshot(a_native), _snapshot(a_np)
    np.testing.assert_array_equal(s1["kf_point_idx"], s2["kf_point_idx"])
    np.testing.assert_array_equal(s1["obs_count"], s2["obs_count"])
    np.testing.assert_array_equal(s1["n_visible"], s2["n_visible"])
    np.testing.assert_array_equal(s1["n_found"], s2["n_found"])
    np.testing.assert_array_equal(s1["pt_valid"], s2["pt_valid"])
    assert s1["obs_sets"] == s2["obs_sets"]
    # covisibility derived from the tables must agree too
    for k in range(a_native.num_kfs):
        if a_native.kf_valid[k]:
            np.testing.assert_array_equal(
                a_native.covisibility_counts(k), a_np.covisibility_counts(k)
            )


def test_register_throughput():
    """Native path must beat the scalar loop decisively at KITTI scale."""
    import time

    lib = native.load_arena_ops()
    if lib is None:
        pytest.skip("no compiler")
    cap = CapacityConfig(max_keyframes=4, max_map_points=40000, max_features=2048)
    arena = MapArena.create(cap, 2048)
    for _ in range(30000):
        arena.add_point(np.zeros(3, np.float32), np.zeros(8, np.uint32), 0,
                        np.array([0, 0, 1.0], np.float32), 1.0, 30.0)
    point_idx = np.arange(2048, dtype=np.int32)
    t0 = time.perf_counter()
    arena.add_keyframe(
        np.eye(4, dtype=np.float32), 0, 0.0,
        np.zeros((2048, 2), np.float32), np.full(2048, -1.0, np.float32),
        np.full(2048, -1.0, np.float32), np.zeros(2048, np.int16),
        np.zeros(2048, np.float32), np.zeros((2048, 8), np.uint32),
        np.ones(2048, bool), point_idx,
    )
    dt = time.perf_counter() - t0
    assert dt < 0.05, f"add_keyframe took {dt * 1e3:.1f} ms"
    assert (arena.pt_obs_count[:2048] == 1).all()


def test_spanning_tree_pose_composition():
    """erase_keyframe freezes Tcp to the best covisible parent (keyframe.cpp:546-607);
    effective_kf_pose composes through parent chains so a culled keyframe's
    effective pose follows later refinements of its live ancestor
    (SaveTrajectoryKITTI semantics, slam_system.cpp:283-296)."""
    cap = CapacityConfig(max_keyframes=8, max_map_points=64, max_features=16,
                         max_obs_per_point=8)
    a = MapArena.create(cap)

    def pose(tx):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = tx
        return T

    n = 16
    xy = np.zeros((n, 2), np.float32)
    ur = np.full(n, -1.0, np.float32)
    dep = np.full(n, -1.0, np.float32)
    octv = np.zeros(n, np.int16)
    ang = np.zeros(n, np.float32)
    desc = np.zeros((n, 8), np.uint32)
    val = np.ones(n, bool)
    pid_none = np.full(n, -1, np.int32)
    k0 = a.add_keyframe(pose(0.0), 0, 0.0, xy, ur, dep, octv, ang, desc, val, pid_none.copy())
    k1 = a.add_keyframe(pose(1.0), 1, 0.1, xy, ur, dep, octv, ang, desc, val, pid_none.copy())
    k2 = a.add_keyframe(pose(2.0), 2, 0.2, xy, ur, dep, octv, ang, desc, val, pid_none.copy())
    # shared observations so covisibility picks k1 as k2's parent
    pids = a.add_points(np.zeros((6, 3), np.float32), np.zeros((6, 8), np.uint32),
                        k1, np.zeros((6, 3), np.float32), np.zeros(6, np.float32),
                        np.ones(6, np.float32))
    a.associate_batch(k1, np.arange(6), pids)
    a.associate_batch(k2, np.arange(6), pids)
    a.associate_batch(k0, np.arange(2), pids[:2])

    a.erase_keyframe(k2)
    assert a.kf_parent[k2] == k1
    # frozen relative transform reproduces the pose at cull time
    np.testing.assert_allclose(a.effective_kf_pose(k2), pose(2.0), atol=1e-6)
    # a later BA/loop refinement moves the parent; the culled KF follows
    a.kf_pose[k1] = pose(5.0)
    expect = a.kf_rel_to_parent[k2].astype(np.float64) @ pose(5.0).astype(np.float64)
    np.testing.assert_allclose(a.effective_kf_pose(k2), expect, atol=1e-6)
    # chain: cull the parent too (k1 -> k0), grandchild composes through both
    a.erase_keyframe(k1)
    assert a.kf_parent[k1] == k0
    a.kf_pose[k0] = pose(-3.0)
    e1 = a.kf_rel_to_parent[k1].astype(np.float64) @ pose(-3.0).astype(np.float64)
    e2 = a.kf_rel_to_parent[k2].astype(np.float64) @ e1
    np.testing.assert_allclose(a.effective_kf_pose(k1), e1, atol=1e-6)
    np.testing.assert_allclose(a.effective_kf_pose(k2), e2, atol=1e-6)
