#!/usr/bin/env python
"""Micro-profile of the chunked tracking device program: time each sub-program
(pyramid, FAST+select+orient+BRIEF, stereo match, motion track, local-map track,
pose opt) in isolation on the target chip, to locate the single-chip fps bottleneck.

Usage: python tools/micro_profile.py [--sync 4] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sync", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        os.environ.setdefault("SLAM_TPU_NO_COMPILE_CACHE", "1")  # CPU AOT cache loader is crash-prone
        jax.config.update("jax_platform_name", "cpu")

    from slam_framework_tpu.config import SlamConfig
    from slam_framework_tpu.io import synthetic
    from slam_framework_tpu.ops import pyramid as pyr_mod
    from slam_framework_tpu.ops import stereo_match
    from slam_framework_tpu.pipeline.tracker import StereoTracker

    cfg = SlamConfig()
    K = args.sync
    world = synthetic.make_world(num_frames=K + 2, cam=cfg.camera, seed=3, speed=1.0,
                                 num_landmarks=9000)
    pairs = [world.stereo_pair(f) for f in range(K + 2)]

    tracker = StereoTracker(cfg, sync_every=K)
    # initialize + run a couple frames to build state/block
    for f in range(K + 2):
        tracker.track(*pairs[f], world.timestamps[f])
    fe = tracker.frontend

    images = jnp.stack(
        [jnp.stack([jnp.asarray(l), jnp.asarray(r)]) for (l, r) in pairs[:K]]
    )
    state = tracker._dstate
    block = tracker._block

    # 1) full chunk
    full = timeit(lambda im: tracker._jit_chunk(state, im, block), images)

    # 2) vmapped frontend only
    fe_vmap = jax.jit(jax.vmap(lambda img: fe._process(img[0], img[1])))
    fe_ms = timeit(fe_vmap, images)

    # 3) scan tracking only (frontend precomputed)
    fds = jax.block_until_ready(fe_vmap(images))

    @jax.jit
    def scan_only(state, fds, block):
        P = block.pos.shape[0]
        zeros = jnp.zeros(P, jnp.int32)

        def body(carry, fd):
            st, vis_acc, found_acc = carry
            st2, summary, pack, desc, vis, found = tracker._track_core(st, fd, block)
            return (st2, vis_acc + vis, found_acc + found), (summary, pack, desc)

        return jax.lax.scan(body, (state, zeros, zeros), fds)

    scan_ms = timeit(scan_only, state, fds, block)

    # 4) frontend internals on ONE image
    left = jnp.asarray(pairs[0][0], jnp.float32)
    right = jnp.asarray(pairs[0][1], jnp.float32)
    pyr_one = jax.jit(lambda im: pyr_mod.build_pyramid(im, cfg.orb.num_levels, cfg.orb.scale_factor))
    pyr_ms = timeit(pyr_one, left)
    lp = jax.block_until_ready(pyr_one(left))
    rp = jax.block_until_ready(pyr_one(right))
    ext_one = jax.jit(fe.extractor._extract_from_pyramid)
    ext_ms = timeit(ext_one, lp)
    fl = jax.block_until_ready(ext_one(lp))
    fr = jax.block_until_ready(ext_one(rp))
    sm_one = jax.jit(lambda fl, fr, lp, rp: stereo_match.match_stereo(
        fl, fr, lp, rp, tracker.K, fe.extractor.scales))
    sm_ms = timeit(sm_one, fl, fr, lp, rp)

    # 5) track_core single frame pieces
    from slam_framework_tpu.pipeline import track_ops
    fd0 = jax.tree.map(lambda x: x[0], fds)
    pred = state.velocity @ state.pose

    tm = jax.jit(lambda fd, pred: track_ops.track_motion(
        fd, pred, state.pt_pos, state.desc, state.octave, state.angle,
        state.pt_mask, K=tracker.K, num_levels=cfg.orb.num_levels,
        scale_factor=cfg.orb.scale_factor))
    tm_ms = timeit(tm, fd0, pred)

    tl = jax.jit(lambda fd, pose, prior: track_ops.track_local_map(
        fd, pose, prior, block, K=tracker.K, th=2.0,
        num_levels=cfg.orb.num_levels, scale_factor=cfg.orb.scale_factor,
        image_wh=(cfg.camera.width, cfg.camera.height)))
    prior = jnp.full(fd0.xy.shape[0], -1, jnp.int32)
    tl_ms = timeit(tl, fd0, state.pose, prior)

    print(f"chunk K={K}: total {full:8.2f} ms  ({full / K:6.2f} ms/frame)")
    print(f"  frontend vmap(K)     {fe_ms:8.2f} ms  ({fe_ms / K:6.2f} ms/frame)")
    print(f"  track scan(K)        {scan_ms:8.2f} ms  ({scan_ms / K:6.2f} ms/frame)")
    print(f"  [1 img] pyramid      {pyr_ms:8.2f} ms")
    print(f"  [1 img] extract      {ext_ms:8.2f} ms")
    print(f"  [1 pair] stereo      {sm_ms:8.2f} ms")
    print(f"  [1 frame] track_motion    {tm_ms:8.2f} ms")
    print(f"  [1 frame] track_local_map {tl_ms:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
