"""Monocular pipeline tests (pipeline/mono_tracker.py).

Covers the reference's mono path: two-view initialization
(src/core/tracker.cpp:297-460, src/util/initializer.cpp), scale-normalized mono
tracking, and Sim3-aligned trajectory accuracy (mono scale is gauge-free)."""

import numpy as np
import pytest

from slam_framework_tpu.config import CameraConfig, CapacityConfig, OrbConfig, SlamConfig
from slam_framework_tpu.io import synthetic, trajectory
from slam_framework_tpu.pipeline.mono_tracker import MonoTracker
from slam_framework_tpu.pipeline.tracker import TrackingState
from slam_framework_tpu.system import SlamSystem


def _cfg():
    return SlamConfig(
        camera=CameraConfig(
            fx=400.0, fy=400.0, cx=320.0, cy=120.0, width=640, height=240,
            fps=10.0, bf=400.0 * 0.54,
        ),
        orb=OrbConfig(num_features=800, num_levels=4),
        capacity=CapacityConfig(
            max_keyframes=64, max_map_points=65536, max_features=1024,
            local_window_points=8192,
        ),
        sensor="monocular",
    )


@pytest.fixture(scope="module")
def world():
    # sideways-rich motion helps the two-view bootstrap (pure forward motion has
    # weak parallax at the epipole, as in the reference)
    # mono at 0.8 m/frame is the hard KITTI regime (ORB-SLAM2 mono also fails on
    # fast sequences); 0.4 m/frame matches its comfortable operating envelope
    # corridor_half_width=8: walls ~8 m out give >2 deg/frame two-view parallax at
    # 0.4 m/frame, so the H/F model-selection gate (initializer.cpp:95) resolves on
    # the first consecutive pair; at the default 14 m the pair is parallax-starved
    # and init is luck-of-the-RANSAC-draw late (reference behavior: mono init waits
    # for parallax)
    return synthetic.make_world(
        num_frames=26, cam=_cfg().camera, seed=1, speed=0.4, yaw_rate=0.012,
        num_landmarks=2500, corridor_half_width=8.0,
    )


class TestMonoTracking:
    def test_initializes_and_tracks(self, world):
        t = MonoTracker(_cfg())
        for f in range(world.num_frames):
            img = world.render(f)
            t.track_image(img, world.timestamps[f])
        t.flush()
        assert t.state == TrackingState.OK, f"state {t.state}"
        assert t.arena.n_valid_kfs >= 2
        assert t.arena.n_valid_pts > 100
        est = t.trajectory_poses()
        # Frames before init aren't tracked. Probed: pairs (0,1)..(0,5) are
        # RH-classified planar (low parallax makes H score competitive on the
        # curved-wall world) and then correctly fail ReconstructH's parallax /
        # clear-winner gates (initializer.cpp:706-735) — so init lands at frame
        # ~6-8 depending on the RANSAC draw. Reference-faithful: ORB-SLAM2 mono
        # also waits for parallax before accepting a model.
        assert len(est) >= world.num_frames - 9
        # Sim3 alignment: mono scale is arbitrary
        frame_ids = [r.frame_id for r in t.records]
        gt = world.poses[frame_ids]
        ate = trajectory.ate_rmse(est, gt, align="sim3")
        travel = 0.4 * world.num_frames
        assert ate < 0.02 * travel, f"mono ATE {ate:.3f} m over {travel:.0f} m"

    def test_map_scale_normalized(self, world):
        """Median scene depth after init is ~1 (tracker.cpp:417-438)."""
        t = MonoTracker(_cfg())
        f = 0
        while t.state != TrackingState.OK and f < world.num_frames:
            t.track_image(world.render(f), world.timestamps[f])
            f += 1
        assert t.state == TrackingState.OK
        arena = t.arena
        pids = np.nonzero(arena.pt_valid[: arena.num_pts])[0]
        T1 = arena.kf_pose[0]
        z = arena.pt_pos[pids] @ T1[:3, :3].T[:, 2] + T1[2, 3]
        assert 0.5 < np.median(z) < 2.0

    def test_system_facade_mono(self, world):
        sys_ = SlamSystem(_cfg())
        for f in range(world.num_frames):
            sys_.track_monocular(world.render(f), world.timestamps[f])
        stats = sys_.shutdown()
        assert stats["keyframes"] >= 2
        assert sys_.tracking_state == TrackingState.OK
