#!/usr/bin/env python
"""Device-side microbenchmark: per-kernel timing of the tracking chunk program.

Times each sub-program of the per-frame pipeline on the real device, amortizing
RPC/tunnel latency by dispatching `iters` async calls back-to-back and blocking
once. Prints a JSON breakdown in ms per *frame*.

Usage: python tools/profile_device.py [--iters 10] [--sync 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters, *args):
    """Dispatch `iters` calls back-to-back, block once; returns ms per call."""
    out = fn(*args)  # warm compile
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sync", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        os.environ.setdefault("SLAM_TPU_NO_COMPILE_CACHE", "1")  # CPU AOT cache loader is crash-prone
        jax.config.update("jax_platform_name", "cpu")
    import jax.numpy as jnp

    from slam_framework_tpu.config import SlamConfig
    from slam_framework_tpu.io import synthetic
    from slam_framework_tpu.ops import pyramid as pyr_mod, stereo_match
    from slam_framework_tpu.pipeline import track_ops
    from slam_framework_tpu.pipeline.tracker import StereoTracker

    cfg = SlamConfig()
    K = args.sync
    world = synthetic.make_world(num_frames=16, cam=cfg.camera, seed=3, speed=1.0,
                                 num_landmarks=9000)
    pairs = [world.stereo_pair(f) for f in range(16)]

    tracker = StereoTracker(cfg, sync_every=K)
    for f in range(12):
        tracker.track(*pairs[f], world.timestamps[f])
    tracker.flush()

    state, block = tracker._dstate, tracker._block
    assert state is not None
    images = jnp.stack(
        [jnp.stack([jnp.asarray(l), jnp.asarray(r)]) for (l, r) in pairs[:K]]
    )
    fe = tracker.frontend

    res = {}
    # full chunk program (K frames / dispatch)
    res["chunk_total"] = timeit(tracker._jit_chunk, args.iters, state, images, block) / K

    # vmapped frontend over K frames
    vfe = jax.jit(jax.vmap(lambda img: fe._process(img[0], img[1])))
    res["frontend_vmapped"] = timeit(vfe, args.iters, images) / K
    fds = jax.block_until_ready(vfe(images))

    # single-frame frontend
    sfe = jax.jit(fe._process)
    res["frontend_single"] = timeit(sfe, args.iters, images[0, 0], images[0, 1])

    # frontend internals (single frame)
    jp = jax.jit(lambda im: pyr_mod.build_pyramid(im.astype(jnp.float32),
                                                  cfg.orb.num_levels, cfg.orb.scale_factor))
    res["pyramid_x2"] = 2 * timeit(jp, args.iters, images[0, 0])
    lp = jax.block_until_ready(jp(images[0, 0]))
    rp = jax.block_until_ready(jp(images[0, 1]))
    jex = jax.jit(fe.extractor._extract_from_pyramid)
    res["extract_x2"] = 2 * timeit(jex, args.iters, lp)
    fl = jax.block_until_ready(jex(lp))
    fr = jax.block_until_ready(jex(rp))
    jsm = jax.jit(lambda fl, fr, lp, rp: stereo_match.match_stereo(
        fl, fr, lp, rp, fe.K, fe.extractor.scales))
    res["stereo_match"] = timeit(jsm, args.iters, fl, fr, lp, rp)

    # tracking core single frame
    fd0 = jax.tree.map(lambda x: x[0], fds)
    jcore = jax.jit(tracker._track_core)
    res["track_core_single"] = timeit(jcore, args.iters, state, fd0, block)

    pred = state.velocity @ state.pose
    jm = jax.jit(lambda fd, pose: track_ops.track_motion(
        fd, pose, state.pt_pos, state.desc, state.octave, state.angle,
        state.pt_mask, K=tracker.K, num_levels=cfg.orb.num_levels,
        scale_factor=cfg.orb.scale_factor))
    res["track_motion"] = timeit(jm, args.iters, fd0, pred)
    r1 = jax.block_until_ready(jm(fd0, pred))

    prior = jnp.where((r1.assoc >= 0) & r1.inlier,
                      state.assoc_slot[jnp.maximum(r1.assoc, 0)], -1)
    jl = jax.jit(lambda fd, pose, prior: track_ops.track_local_map(
        fd, pose, prior, block, K=tracker.K, th=2.0,
        num_levels=cfg.orb.num_levels, scale_factor=cfg.orb.scale_factor,
        image_wh=(cfg.camera.width, cfg.camera.height)))
    res["track_local_map"] = timeit(jl, args.iters, fd0, r1.pose, prior)
    r2 = jax.block_until_ready(jl(fd0, r1.pose, prior))

    jf = jax.jit(lambda fd, pose, slot: track_ops.fuse_candidates(
        fd, pose, slot, block, K=tracker.K, num_levels=cfg.orb.num_levels,
        scale_factor=cfg.orb.scale_factor,
        image_wh=(cfg.camera.width, cfg.camera.height)))
    slot = jnp.where((r2.assoc >= 0) & r2.inlier, r2.assoc, -1)
    res["fuse_candidates"] = timeit(jf, args.iters, fd0, r2.pose, slot)

    # pose optimization alone (as embedded in track_local_map: 3x4)
    from slam_framework_tpu.optim import pose_opt as po
    obs = track_ops._obs_from_assoc(fd0, block.pos, slot)
    jpo = jax.jit(lambda pose, obs: po.optimize_pose(pose, obs, tracker.K,
                                                     n_rounds=3, n_iters=4))
    res["pose_opt_3x4"] = timeit(jpo, args.iters, r2.pose, obs)

    # reference fallback branch (compiled into the cond)
    jrf = jax.jit(lambda fd, pose: track_ops.track_reference_fallback(
        fd, pose, block, K=tracker.K))
    res["reference_fallback"] = timeit(jrf, args.iters, fd0, state.pose)

    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
