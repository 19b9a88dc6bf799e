"""Equivalence tests for the Pallas TPU kernels against their XLA formulations.

On the CPU test mesh the kernels run through the Pallas interpreter (same program,
no Mosaic), so these tests pin the kernel semantics that the TPU path relies on:
  - ops/fast_pallas.fast_nms_strength == fast.nms3x3(fast.fast_strength_map(.))
    away from the masked border (reference: cv::FAST in ORBextractor::Compute,
    src/orb_features/orb_extractor.cpp:750-757).

(The rounds-3/4 prototype kernels ops/match_pallas.py and ops/patch_pallas.py
were retired in round 4 after hardware qualification: the compiled patch
window-gather measured 5.8 ms/image vs 3.3 ms for the XLA dynamic-slice gather
on the v5e, and the streaming matcher targeted a stage that costs only
~4 ms/frame of the 17 ms/frame chunk — see SCALING.md.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from slam_framework_tpu.ops import fast, fast_pallas


def test_fast_nms_strength_matches_xla():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 256, (96, 160)).astype(np.float32))
    ref = jax.jit(lambda im: fast.mask_border(fast.nms3x3(fast.fast_strength_map(im)), 16))
    new = jax.jit(lambda im: fast.mask_border(fast_pallas.fast_nms_strength(im), 16))
    a = np.asarray(ref(img))
    b = np.asarray(new(img))
    np.testing.assert_array_equal(a, b)
    assert (a > 0).sum() > 0  # the random image must actually contain corners


def test_fast_nms_strength_nonmultiple_strip():
    # H not a multiple of the strip size exercises the padded tail
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (75, 140)).astype(np.float32))
    a = np.asarray(fast.mask_border(fast.nms3x3(fast.fast_strength_map(img)), 16))
    b = np.asarray(fast.mask_border(fast_pallas.fast_nms_strength(img), 16))
    np.testing.assert_array_equal(a, b)
