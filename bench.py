#!/usr/bin/env python
"""Benchmark: stereo tracked frames/s per chip on a KITTI-geometry synthetic sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (ThorsteinnJonsson/SLAM_framework) publishes no numbers
(BASELINE.md); its design target is real-time at the KITTI sensor rate, 10 fps on CPU
(config/kitti_config_stereo.json fps=10, examples/main_stereo.cpp pacing loop).
vs_baseline is therefore frames/s / 10. BASELINE.json's target is >= 5x (vs_baseline
>= 5) per chip.

The measured loop is the full per-frame pipeline on one chip: ORB front-end (2000
features, 8 levels, 1241x376) + stereo matching + motion-model association + pose
optimization + local-map association + pose optimization, with the host map logic.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    from slam_framework_tpu.config import SlamConfig
    from slam_framework_tpu.io import synthetic
    from slam_framework_tpu.pipeline.tracker import StereoTracker

    cfg = SlamConfig()  # KITTI stereo geometry: 1241x376, 2000 feats, 8 levels
    n_frames = 80
    warmup = 12
    world = synthetic.make_world(
        num_frames=n_frames, cam=cfg.camera, seed=3, speed=1.0, num_landmarks=9000
    )
    # Pre-render all frames so rendering cost stays out of the timed loop.
    pairs = [world.stereo_pair(f) for f in range(n_frames)]

    tracker = StereoTracker(cfg)
    frame_times = []
    for f, (l, r) in enumerate(pairs):
        t0 = time.perf_counter()
        tracker.track(l, r, world.timestamps[f])
        if f >= warmup:
            frame_times.append(time.perf_counter() - t0)
    # Steady-state throughput: trimmed mean of per-frame wall time (drop the
    # 10% fastest/slowest frames) so one network hiccup on the tunneled TPU
    # doesn't dominate a 7-second measurement window.
    ft = np.sort(np.asarray(frame_times))
    k = max(1, len(ft) // 10)
    fps = 1.0 / float(ft[k:-k].mean())

    print(
        json.dumps(
            {
                "metric": "stereo_tracked_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
