"""KITTI IO + example-app tests on a synthetic sequence written in KITTI layout
(io/kitti.py, examples/main_stereo.py — reference: examples/main_stereo.cpp:16-49)."""

import json
import os
import sys

import cv2
import numpy as np
import pytest

from slam_framework_tpu.config import CameraConfig, CapacityConfig, OrbConfig, SlamConfig
from slam_framework_tpu.io import kitti, synthetic


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    """A 20-frame synthetic sequence in KITTI odometry layout + ground truth."""
    root = tmp_path_factory.mktemp("kitti")
    seq_dir = root / "sequences" / "03"
    cam = CameraConfig(fx=400.0, fy=400.0, cx=320.0, cy=120.0, width=640, height=240,
                      bf=200.0)
    world = synthetic.make_world(num_frames=20, cam=cam, seed=5, speed=0.8,
                                 num_landmarks=3000)
    (seq_dir / "image_2").mkdir(parents=True)
    (seq_dir / "image_3").mkdir(parents=True)
    for f in range(20):
        l, r = world.stereo_pair(f)
        cv2.imwrite(str(seq_dir / "image_2" / f"{f:06d}.png"), l)
        cv2.imwrite(str(seq_dir / "image_3" / f"{f:06d}.png"), r)
    np.savetxt(seq_dir / "times.txt", world.timestamps)
    gt_dir = root / "ground_truth_poses" / "poses"
    gt_dir.mkdir(parents=True)
    rows = np.stack([np.linalg.inv(T)[:3, :].reshape(-1) for T in world.poses])
    np.savetxt(gt_dir / "03.txt", rows)
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps({
        "camera": {"fx": 400.0, "fy": 400.0, "cx": 320.0, "cy": 120.0,
                   "width": 640, "height": 240, "bf": 200.0, "fps": 10.0},
        "orb_parameters": {"num_features": 600, "scale_factor": 1.2, "num_levels": 4},
    }))
    return {"root": str(root), "seq": str(seq_dir), "cfg": str(cfg_path),
            "world": world}


def test_load_sequence(kitti_dir):
    seq = kitti.load_sequence(kitti_dir["seq"])
    assert len(seq) == 20
    l, r = seq.stereo_pair(0)
    assert l.shape == (240, 640) and r.shape == (240, 640)
    assert l.dtype == np.uint8
    assert np.all(np.diff(seq.timestamps) > 0)


def test_load_ground_truth(kitti_dir):
    gt = kitti.load_ground_truth(kitti_dir["root"], "03")
    assert gt is not None and gt.shape == (20, 4, 4)
    np.testing.assert_allclose(gt[0], np.eye(4), atol=1e-6)


def test_missing_sequence_raises(tmp_path):
    with pytest.raises((FileNotFoundError, OSError)):
        kitti.load_sequence(str(tmp_path / "nope"))


def test_main_stereo_end_to_end(kitti_dir, tmp_path, capsys):
    """The full example app: config JSON -> tracked sequence -> trajectory + ATE."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        import main_stereo
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "positions.txt")
    rc = main_stereo.run([
        kitti_dir["cfg"], kitti_dir["seq"], "--out", out,
        "--gt-root", kitti_dir["root"], "--seq", "03",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["frames"] == 20
    assert report["keyframes"] >= 2
    assert report["ate_rmse_m"] < 0.2, report
    est = np.loadtxt(out)
    assert est.shape == (20, 12)
