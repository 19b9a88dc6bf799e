"""Tests for the live map/trajectory publisher (reference: RosPublisher,
src/ros/ros_publisher.{h,cpp})."""

import json

import numpy as np
import pytest

from slam_framework_tpu.config import CameraConfig, CapacityConfig, OrbConfig, SlamConfig
from slam_framework_tpu.io import synthetic
from slam_framework_tpu.pipeline.tracker import StereoTracker
from slam_framework_tpu.viz import (
    JsonlSink,
    MapPublisher,
    MemorySink,
    axis_remap,
    save_ply,
)


def _cfg():
    return SlamConfig(
        camera=CameraConfig(
            fx=400.0, fy=400.0, cx=320.0, cy=120.0, width=640, height=240, bf=160.0
        ),
        orb=OrbConfig(num_features=600, num_levels=4),
        capacity=CapacityConfig(
            max_features=600, max_keyframes=64, max_map_points=16384,
            local_window_points=4096, ba_points=1024, ba_obs=4096,
        ),
    )


@pytest.fixture(scope="module")
def tracked():
    cfg = _cfg()
    world = synthetic.make_world(
        num_frames=12, cam=cfg.camera, seed=2, speed=0.8, num_landmarks=2000
    )
    tracker = StereoTracker(cfg)
    for f in range(world.num_frames):
        l, r = world.stereo_pair(f)
        tracker.track(l, r, world.timestamps[f])
    tracker.flush()
    return tracker


def test_axis_remap_matches_reference_convention():
    # (x,y,z) -> (z,-x,-y), ros_publisher.cpp:110-117
    p = np.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(axis_remap(p), [[3.0, -1.0, -2.0]])
    # involution-free: applying thrice returns the original (period-3 rotation)
    np.testing.assert_allclose(axis_remap(axis_remap(axis_remap(p))), p)


def test_snapshot_contents(tracked):
    pub = MapPublisher(tracked, tracked.arena, sinks=[MemorySink()], remap_axes=False)
    snap = pub.publish_once()
    assert snap.n_frames == len(tracked.records)
    assert snap.n_keyframes == tracked.arena.n_valid_kfs
    assert snap.n_points == tracked.arena.n_valid_pts
    assert snap.path.shape == (snap.n_frames, 3)
    assert snap.points_all.shape == (snap.n_points, 3)
    assert snap.kf_positions.shape == (snap.n_keyframes, 3)
    # the forward corridor: camera travels along +z in camera convention,
    # so unremapped path z is monotone-ish increasing
    assert snap.path[-1, 2] > snap.path[0, 2]
    # reference cloud is a subset of the local tracking block
    assert 0 < len(snap.points_ref) <= snap.n_points


def test_snapshot_remap(tracked):
    raw = MapPublisher(tracked, tracked.arena, remap_axes=False).snapshot()
    rem = MapPublisher(tracked, tracked.arena, remap_axes=True).snapshot()
    np.testing.assert_allclose(rem.path, axis_remap(raw.path), atol=1e-6)
    np.testing.assert_allclose(rem.points_all, axis_remap(raw.points_all), atol=1e-6)


def test_background_thread_publishes(tracked):
    import time

    sink = MemorySink()
    pub = MapPublisher(tracked, tracked.arena, sinks=[sink], rate_hz=100.0)
    pub.start()
    t0 = time.time()
    while len(sink.snapshots) < 3 and time.time() - t0 < 5.0:
        time.sleep(0.01)
    pub.stop()
    assert len(sink.snapshots) >= 3
    seqs = [s.seq for s in sink.snapshots]
    assert seqs == sorted(seqs)


def test_jsonl_sink_round_trips(tracked, tmp_path):
    path = str(tmp_path / "viz.jsonl")
    pub = MapPublisher(tracked, tracked.arena, sinks=[JsonlSink(path, max_points=100)])
    pub.publish_once()
    pub.publish_once()
    pub.stop()
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["n_keyframes"] == tracked.arena.n_valid_kfs
    assert len(rec["points_all"]) <= 100
    assert len(rec["path"]) == len(tracked.records)


def test_save_ply(tracked, tmp_path):
    path = str(tmp_path / "cloud.ply")
    pts = tracked.arena.pt_pos[: tracked.arena.num_pts][
        tracked.arena.pt_valid[: tracked.arena.num_pts]
    ]
    save_ply(path, pts)
    txt = open(path).read().splitlines()
    assert txt[0] == "ply"
    assert f"element vertex {len(pts)}" in txt[2]
    assert len(txt) == 7 + len(pts)


def test_system_facade_starts_publisher():
    import dataclasses

    from slam_framework_tpu.system import SlamSystem

    cfg = dataclasses.replace(_cfg(), use_viewer=True)
    world = synthetic.make_world(
        num_frames=8, cam=cfg.camera, seed=2, speed=0.8, num_landmarks=2000
    )
    sys_ = SlamSystem(cfg)
    assert sys_.publisher is not None
    for f in range(world.num_frames):
        l, r = world.stereo_pair(f)
        sys_.track_stereo(l, r, world.timestamps[f])
    snap = sys_.publisher.publish_once()
    assert snap.n_keyframes >= 1
    sys_.shutdown()
    assert sys_.publisher._thread is None
