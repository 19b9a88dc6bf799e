#!/usr/bin/env python
"""Per-op breakdown of the ORB extraction path on the real device (ms/image).

Timing methodology for the tunneled TPU (learned empirically):
  - `jax.block_until_ready` does NOT block on this backend — a `device_get` of a
    small output slice is the only reliable fence;
  - repeated calls on IDENTICAL inputs with dropped outputs serialize on buffer
    deletions (~10x slower than real compute) — so every timed call gets a
    DISTINCT pre-staged input and all outputs are kept alive until the fence.
Reported per-call time = wall(dispatch all + fence) / iters, i.e. pipelined
device throughput, which is what the chunked tracker actually experiences.

Usage: python tools/profile_extract.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leaf(tree):
    import jax

    leaves = jax.tree.leaves(tree)
    return leaves[0].ravel()[0]


def timeit(fn, inputs):
    """fn is dispatched once per (varying) input; fence = device_get of one
    element of the last output. Returns ms per call."""
    import jax

    outs = [fn(*inputs[0])]
    jax.device_get(_leaf(outs[0]))  # warm compile
    t0 = time.perf_counter()
    for args in inputs:
        outs.append(fn(*args))
    jax.device_get(_leaf(outs[-1]))
    dt = (time.perf_counter() - t0) / len(inputs) * 1e3
    del outs
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slam_framework_tpu.config import SlamConfig
    from slam_framework_tpu.io import synthetic
    from slam_framework_tpu.ops import brief, fast, fast_pallas, orient, pyramid, select
    from slam_framework_tpu.ops.extractor import DETECT_MARGIN, OrbExtractor
    from slam_framework_tpu.ops import stereo_match

    cfg = SlamConfig()
    world = synthetic.make_world(num_frames=2, cam=cfg.camera, seed=3, speed=1.0,
                                 num_landmarks=9000)
    left, right = world.stereo_pair(0)
    ex = OrbExtractor(cfg.orb, max_features=cfg.capacity.max_features)
    it = args.iters

    # pre-staged distinct inputs
    imgs = [jnp.asarray(np.asarray(left, np.float32) + 0.001 * i) for i in range(it)]

    res = {}
    jp = jax.jit(lambda im: pyramid.build_pyramid(im, cfg.orb.num_levels, cfg.orb.scale_factor))
    res["pyramid"] = timeit(jp, [(im,) for im in imgs])
    lps = [jp(im) for im in imgs]
    jax.device_get(_leaf(lps[-1]))

    jfast = jax.jit(lambda lv: [fast_pallas.fast_nms_strength(x) for x in lv])
    res["fast_all_levels"] = timeit(jfast, [(lp,) for lp in lps])
    nmss = [jfast(lp) for lp in lps]
    jax.device_get(_leaf(nmss[-1]))

    def _sel(nms_lv):
        outs = []
        for lvl, s in enumerate(nms_lv):
            n_lvl = ex.per_level[lvl]
            st = fast.mask_border(s, DETECT_MARGIN)
            hi = jnp.where(st > float(cfg.orb.ini_thresh_fast), st, 0.0)
            lo = jnp.where(st > float(cfg.orb.min_thresh_fast), st, 0.0)
            outs.append(select.select_uniform(hi, lo, n_lvl, cell=cfg.orb.fast_cell_size))
        return outs
    jsel = jax.jit(_sel)
    res["select_all_levels"] = timeit(jsel, [(n,) for n in nmss])
    sels = [jsel(n) for n in nmss]
    jax.device_get(_leaf(sels[-1]))

    jor = jax.jit(lambda lv, ss: [orient.ic_angles(x, s.xy) for x, s in zip(lv, ss)])
    res["orient_all_levels"] = timeit(jor, list(zip(lps, sels)))
    angs = [jor(lp, ss) for lp, ss in zip(lps, sels)]
    jax.device_get(_leaf(angs[-1]))

    jbl = jax.jit(lambda lv: [pyramid.gaussian_blur(x) for x in lv])
    res["blur_all_levels"] = timeit(jbl, [(lp,) for lp in lps])
    blurs = [jbl(lp) for lp in lps]
    jax.device_get(_leaf(blurs[-1]))

    jbr = jax.jit(lambda bl, ss, aa: [
        brief.brief_descriptors(b, s.xy, a) for b, s, a in zip(bl, ss, aa)])
    res["brief_all_levels"] = timeit(jbr, list(zip(blurs, sels, angs)))

    jfull = jax.jit(ex._extract_from_pyramid)
    res["extract_total"] = timeit(jfull, [(lp,) for lp in lps])

    # stereo matching (needs features of both images)
    rimgs = [jnp.asarray(np.asarray(right, np.float32) + 0.001 * i) for i in range(it)]
    rps = [jp(im) for im in rimgs]
    fls = [jfull(lp) for lp in lps]
    frs = [jfull(rp) for rp in rps]
    jax.device_get(_leaf(frs[-1]))
    from slam_framework_tpu.geometry.projection import Intrinsics
    K = Intrinsics(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy, cfg.camera.bf)
    jsm = jax.jit(lambda fl, fr, lp, rp: stereo_match.match_stereo(fl, fr, lp, rp, K, ex.scales))
    res["stereo_match"] = timeit(jsm, list(zip(fls, frs, lps, rps)))

    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
