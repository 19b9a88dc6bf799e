"""Map checkpoint / resume tests (io/checkpoint.py, SlamSystem.save_map/load_map).

The reference's SaveMap/LoadMap is an acknowledged TODO (src/slam_system.h:59-61);
here it is a capability: save after a run, restore into a fresh system, relocalize
against the loaded map and keep tracking.
"""

import numpy as np
import pytest

from slam_framework_tpu.config import CameraConfig, CapacityConfig, OrbConfig, SlamConfig
from slam_framework_tpu.io import checkpoint, synthetic
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
        sensor="stereo",
    )


@pytest.fixture(scope="module")
def world():
    return synthetic.make_world(
        num_frames=40, cam=_cfg().camera, seed=2, speed=0.8, yaw_rate=0.003,
        num_landmarks=2500,
    )


@pytest.fixture(scope="module")
def saved(world, tmp_path_factory):
    """Track 30 frames, save, and hand back (path, reference stats)."""
    path = str(tmp_path_factory.mktemp("ckpt") / "map.npz")
    sys_ = SlamSystem(_cfg())
    for f in range(30):
        l, r = world.stereo_pair(f)
        sys_.track_stereo(l, r, world.timestamps[f])
    stats = sys_.shutdown()
    sys_.save_map(path)
    return {"path": path, "stats": stats, "arena": sys_.arena,
            "records": list(sys_.tracker.records), "had_vocab": sys_.vocab is not None}


def test_roundtrip_arrays(saved):
    arena, records, vocab = checkpoint.load_map(saved["path"])
    src = saved["arena"]
    assert arena.num_kfs == src.num_kfs and arena.num_pts == src.num_pts
    np.testing.assert_array_equal(arena.kf_valid, src.kf_valid)
    np.testing.assert_array_equal(arena.kf_pose, src.kf_pose)
    np.testing.assert_array_equal(arena.pt_pos, src.pt_pos)
    np.testing.assert_array_equal(arena.pt_obs_kf, src.pt_obs_kf)
    np.testing.assert_array_equal(arena.kf_point_idx, src.kf_point_idx)
    assert len(records) == len(saved["records"])
    for a, b in zip(records, saved["records"]):
        assert a.frame_id == b.frame_id and a.lost == b.lost and a.ref_kf == b.ref_kf
        if b.pose is not None:
            np.testing.assert_allclose(a.pose, b.pose)
    if saved["had_vocab"]:
        assert vocab is not None and vocab.num_words > 0


def test_resume_relocalizes_and_tracks(saved, world):
    """Fresh system + load_map: next frames relocalize against the saved map."""
    if not saved["had_vocab"]:
        pytest.skip("no vocabulary trained in the saved run")
    sys_ = SlamSystem(_cfg())
    sys_.load_map(saved["path"])
    assert sys_.tracking_state == TrackingState.LOST
    assert sys_.tracker.relocalizer is not None
    relocalized = False
    for f in range(30, 40):
        l, r = world.stereo_pair(f)
        sys_.track_stereo(l, r, world.timestamps[f])
        if sys_.tracking_state == TrackingState.OK:
            relocalized = True
    sys_.tracker.flush()
    assert relocalized, "never relocalized against the loaded map"
    # the resumed trajectory keeps the frame numbering
    assert sys_.tracker.records[-1].frame_id == 39
    est = sys_.frame_poses()
    assert est.shape[0] == 40


def test_checkpoint_format_guard(saved, tmp_path):
    import numpy as _np

    arena, _, _ = checkpoint.load_map(saved["path"])
    bad = str(tmp_path / "bad.npz")
    _np.savez(bad, format_version=_np.int64(checkpoint.FORMAT_VERSION + 1))
    with pytest.raises(ValueError):
        checkpoint.load_map(bad)
