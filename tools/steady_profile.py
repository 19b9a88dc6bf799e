#!/usr/bin/env python
"""Steady-state stage breakdown of the EXACT bench protocol (VERDICT r4 item 1a).

Runs bench.py's workload verbatim (330-frame loopy world, prestaged device
frames, full warm lap, wall-clocked timed lap) and prints a JSON report:
  - fps / ate / keyframes / loops (same as bench.py),
  - the StageTimers totals + counts (dispatch, drain/queue_wait,
    drain/device_get, process, keyframe, mapper/* sub-stages),
  - the unattributed remainder (wall - sum of stages) = Python/track loop.
Optionally --cprofile dumps the timed lap's top-40 cumulative entries.

The breakdown table in SCALING.md is produced by this tool — rerun after every
host-path change.

Usage: python tools/steady_profile.py [--sync 8] [--frames 330] [--cprofile]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sync", type=int, default=8)
    ap.add_argument("--frames", type=int, default=330)
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--metrics", default=None, help="dump metrics JSONL here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slam_framework_tpu.config import SlamConfig
    from slam_framework_tpu.io import synthetic, trajectory
    from slam_framework_tpu.system import SlamSystem

    cfg = SlamConfig()
    n_frames = args.frames
    world = synthetic.make_world(
        num_frames=n_frames, cam=cfg.camera, seed=3, speed=1.0,
        yaw_rate=2.0 * np.pi / 300.0, num_landmarks=22000,
    )
    pairs = []
    for f in range(n_frames):
        l, r = world.stereo_pair(f)
        pairs.append(jax.device_put(jnp.stack([jnp.asarray(l), jnp.asarray(r)])))
    jax.block_until_ready(pairs)

    warm = SlamSystem(cfg, sync_every=args.sync)
    for f in range(n_frames):
        warm.track_stereo_device(pairs[f], world.timestamps[f])
    warm.shutdown()
    del warm

    system = SlamSystem(cfg, sync_every=args.sync)
    prof = None
    if args.cprofile:
        import cProfile

        prof = cProfile.Profile()
        prof.enable()
    t0 = time.perf_counter()
    for f, pair in enumerate(pairs):
        system.track_stereo_device(pair, world.timestamps[f])
    system.tracker.flush()
    wall = time.perf_counter() - t0
    if prof is not None:
        prof.disable()
    stats = system.shutdown()

    est = system.frame_poses()
    gt = world.poses[: len(est)]
    ate = trajectory.ate_rmse(est, gt, align="se3")

    t = system.tracker.timers
    stages = {
        k: {"total_s": round(t.total_s[k], 3), "n": t.count[k],
            "ms_per_call": round(1e3 * t.total_s[k] / max(t.count[k], 1), 1)}
        for k in sorted(t.total_s)
    }
    # top-level stages that sum against wall ("keyframe" and "mapper/*" nest
    # inside process/drain and must not double-count)
    top = ("dispatch", "drain", "process")
    attributed = sum(t.total_s.get(k, 0.0) for k in top)
    report = {
        "fps": round(n_frames / wall, 2),
        "wall_s": round(wall, 2),
        "ate_m": round(float(ate), 4),
        "keyframes": stats.get("keyframes", 0),
        "loops_closed": stats.get("loops_closed", 0),
        "lost_frames": sum(1 for r in system.tracker.records if r.lost),
        "attributed_s": round(attributed, 2),
        "unattributed_s": round(wall - attributed, 2),
        "stages": stages,
    }
    print(json.dumps(report, indent=1))
    if args.metrics:
        system.dump_metrics(args.metrics)
    if prof is not None:
        import pstats

        ps = pstats.Stats(prof)
        ps.sort_stats("cumulative")
        ps.print_stats(40)
    return 0


if __name__ == "__main__":
    sys.exit(main())
