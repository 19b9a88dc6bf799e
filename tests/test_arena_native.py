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
