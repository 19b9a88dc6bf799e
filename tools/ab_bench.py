#!/usr/bin/env python
"""A/B deviation benches on the full-system bench workload (VERDICT r3 item 8).

Runs bench.py's exact protocol (full warm lap + wall-clock timed lap on the
330-frame loopy world) with ONE configuration deviation per invocation, so the
effect of each knob on throughput AND accuracy is measured on the real system.
Results are recorded in SCALING.md's deviation table.

Usage:
  python tools/ab_bench.py baseline
  python tools/ab_bench.py sync=16 | depth=1 | smooth=0.0 | smooth=0.75
  python tools/ab_bench.py ba_iters=3,6 | kf_budget=1 | no_cull
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    # combos compose with '+': e.g. sync=16+free_kf
    parts = variant.split("+")

    import dataclasses

    import jax
    import jax.numpy as jnp

    from slam_framework_tpu.config import SlamConfig
    from slam_framework_tpu.io import synthetic, trajectory
    from slam_framework_tpu.system import SlamSystem

    cfg = SlamConfig()
    sync = 8
    depth = 2
    kf_budget = None  # None = frame-scaled default

    for part in parts:
        if part.startswith("sync="):
            sync = int(part.split("=")[1])
        elif part.startswith("depth="):
            depth = int(part.split("=")[1])
        elif part.startswith("smooth="):
            cfg = dataclasses.replace(cfg, tracker=dataclasses.replace(
                cfg.tracker, velocity_rotation_smoothing=float(part.split("=")[1])))
        elif part.startswith("ba_iters="):
            a, b = part.split("=")[1].split(",")
            cfg = dataclasses.replace(cfg, mapping=dataclasses.replace(
                cfg.mapping, local_ba_iters_first=int(a), local_ba_iters_second=int(b)))
        elif part.startswith("kf_budget="):
            kf_budget = int(part.split("=")[1])
        elif part in ("serial_kf", "free_kf"):
            pass  # applied on the tracker below
        elif part == "no_cull":
            cfg = dataclasses.replace(cfg, mapping=dataclasses.replace(
                cfg.mapping, cull_keyframes=False))
        elif part != "baseline":
            print(f"unknown variant {part}", file=sys.stderr)
            return 2

    n_frames = 330
    world = synthetic.make_world(
        num_frames=n_frames, cam=cfg.camera, seed=3, speed=1.0,
        yaw_rate=2.0 * np.pi / 300.0, num_landmarks=22000,
    )
    pairs = []
    for f in range(n_frames):
        l, r = world.stereo_pair(f)
        pairs.append(jax.device_put(jnp.stack([jnp.asarray(l), jnp.asarray(r)])))
    jax.block_until_ready(pairs)

    def build():
        s = SlamSystem(cfg, sync_every=sync)
        s.tracker.pipeline_depth = depth
        if "free_kf" in parts:
            # r5: vestigial — the pipelined order (fetch -> process-critical ->
            # dispatch -> deferred) overlaps post-keyframe host work with device
            # compute on EVERY chunk while keeping serial block freshness, so
            # there is no serial-after-keyframe arm left to toggle.
            s.tracker.serial_after_keyframe = False
        if kf_budget is not None:
            s.tracker.max_kfs_per_chunk = kf_budget
        return s

    warm = build()
    for f in range(n_frames):
        warm.track_stereo_device(pairs[f], world.timestamps[f])
    warm.shutdown()
    del warm

    system = build()
    t0 = time.perf_counter()
    for f, pair in enumerate(pairs):
        system.track_stereo_device(pair, world.timestamps[f])
    system.tracker.flush()
    wall = time.perf_counter() - t0
    stats = system.shutdown()

    est = system.frame_poses()
    gt = world.poses[: len(est)]
    ate = trajectory.ate_rmse(est, gt, align="se3")
    print(json.dumps({
        "variant": variant,
        "fps": round(n_frames / wall, 2),
        "ate_m": round(float(ate), 4),
        "lost_frames": sum(1 for r in system.tracker.records if r.lost),
        "loops_closed": stats.get("loops_closed", 0),
        "keyframes": stats.get("keyframes", 0),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
