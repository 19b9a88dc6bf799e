"""Equivalence tests for the Pallas TPU kernels against their XLA formulations.

On the CPU test mesh the kernels run through the Pallas interpreter (same program,
no Mosaic), so these tests pin the kernel semantics that the TPU path relies on:
  - ops/fast_pallas.fast_nms_strength == fast.nms3x3(fast.fast_strength_map(.))
    away from the masked border (reference: cv::FAST in ORBextractor::Compute,
    src/orb_features/orb_extractor.cpp:750-757);
  - ops/match_pallas.projection_best_match == matcher.gated_match +
    resolve_duplicate_columns + per-column inversion (reference:
    OrbMatcher::SearchByProjection, src/orb_features/orb_matcher.cpp:13-103).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_framework_tpu.matching import hamming, matcher
from slam_framework_tpu.ops import fast, fast_pallas, match_pallas


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


def _match_xla(desc_a, desc_b, pred_uv, feat_xy, radius, lvl, feat_oct,
               in_frustum, col_valid, max_dist):
    ham = hamming.hamming_matrix(jnp.asarray(desc_a), jnp.asarray(desc_b))
    gate = (
        matcher.window_gate(jnp.asarray(pred_uv), jnp.asarray(feat_xy), jnp.asarray(radius))
        & matcher.octave_gate(jnp.asarray(lvl), jnp.asarray(feat_oct), -1, 1)
        & jnp.asarray(in_frustum)[:, None]
        & jnp.asarray(col_valid)[None, :]
    )
    res = matcher.gated_match(ham, gate, max_dist=max_dist)
    res = matcher.resolve_duplicate_columns(res, desc_b.shape[0])
    cols = jnp.arange(desc_b.shape[0], dtype=jnp.int32)
    chose = res.valid[:, None] & (res.idx[:, None] == cols[None, :])
    d = jnp.where(chose, res.dist[:, None], matcher.BIG)
    best_row = jnp.argmin(d, axis=0).astype(jnp.int32)
    has = jnp.min(d, axis=0) < matcher.BIG
    return np.asarray(jnp.where(has, best_row, -1))


@pytest.mark.parametrize("P,N", [(512, 256), (700, 256)])
def test_projection_best_match_matches_xla(P, N):
    rng = np.random.default_rng(0)
    desc_a = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
    desc_b = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
    # plant near-duplicates so real (sub-threshold) matches exist
    for i in range(0, P, 3):
        j = int(rng.integers(0, N))
        desc_a[i] = desc_b[j]
        desc_a[i, int(rng.integers(0, 8))] ^= np.uint32(1 << int(rng.integers(0, 32)))
    pred_uv = rng.uniform(0, [640, 480], (P, 2)).astype(np.float32)
    feat_xy = rng.uniform(0, [640, 480], (N, 2)).astype(np.float32)
    radius = rng.uniform(5, 200, P).astype(np.float32)
    lvl = rng.integers(0, 8, P).astype(np.int32)
    feat_oct = rng.integers(0, 8, N).astype(np.int32)
    in_frustum = rng.random(P) < 0.7
    col_valid = rng.random(N) < 0.9

    expected = _match_xla(desc_a, desc_b, pred_uv, feat_xy, radius, lvl, feat_oct,
                          in_frustum, col_valid, 100)

    a_bits = hamming.unpack_to_bits(jnp.asarray(desc_a))
    na = jnp.sum(a_bits.astype(jnp.int32), -1).astype(jnp.float32)
    b_bits = hamming.unpack_to_bits(jnp.asarray(desc_b))
    nb = jnp.sum(b_bits.astype(jnp.int32), -1).astype(jnp.float32)
    assoc, dist = match_pallas.projection_best_match(
        a_bits, na, jnp.asarray(pred_uv),
        jnp.where(jnp.asarray(in_frustum), jnp.asarray(radius), 0.0),
        jnp.asarray(lvl).astype(jnp.float32), jnp.ones(P, jnp.float32),
        b_bits, nb, jnp.asarray(feat_xy), jnp.asarray(feat_oct).astype(jnp.float32),
        jnp.full(N, -1.0, jnp.float32), jnp.asarray(col_valid).astype(jnp.float32),
        max_dist=100,
    )
    np.testing.assert_array_equal(np.asarray(assoc), expected)
    assert (expected >= 0).sum() > 0


def test_projection_best_match_depth_gate():
    """depth_tol gates out pairs with inconsistent stereo depth (Fuse semantics)."""
    P, N = 256, 256
    rng = np.random.default_rng(1)
    desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
    a_bits = hamming.unpack_to_bits(jnp.asarray(desc))
    na = jnp.sum(a_bits.astype(jnp.int32), -1).astype(jnp.float32)
    xy = rng.uniform(0, [640, 480], (N, 2)).astype(np.float32)
    # identical descriptors + identical positions: everything matches at dist 0
    # unless the depth gate kills it
    z = np.full(P, 10.0, np.float32)
    depth_ok = np.full(N, 10.5, np.float32)     # within 0.2 * max(z, 1)
    depth_bad = np.full(N, 20.0, np.float32)    # outside
    common = dict(max_dist=50, depth_tol=0.2)
    ok, _ = match_pallas.projection_best_match(
        a_bits, na, jnp.asarray(xy), jnp.full(P, 10.0), jnp.zeros(P), jnp.asarray(z),
        a_bits, na, jnp.asarray(xy), jnp.zeros(N), jnp.asarray(depth_ok),
        jnp.ones(N), **common)
    bad, _ = match_pallas.projection_best_match(
        a_bits, na, jnp.asarray(xy), jnp.full(P, 10.0), jnp.zeros(P), jnp.asarray(z),
        a_bits, na, jnp.asarray(xy), jnp.zeros(N), jnp.asarray(depth_bad),
        jnp.ones(N), **common)
    assert (np.asarray(ok) >= 0).sum() == N
    assert (np.asarray(bad) >= 0).sum() == 0


def test_patch_gather_windows_matches_slices():
    """ops/patch_pallas.gather_windows (interpret mode on CPU) == edge-padded
    window slices — the contract ops/orient.py and ops/brief.py rely on
    (reference: the patch loops of IC_Angle / computeOrbDescriptor,
    src/orb_features/orb_extractor.cpp:18-88)."""
    from slam_framework_tpu.ops import patch_pallas

    rng = np.random.default_rng(3)
    H, W = 72, 300
    img_np = rng.standard_normal((H, W)).astype(np.float32)
    img = jnp.asarray(img_np)
    xy_np = np.stack([rng.integers(0, W, 96), rng.integers(0, H, 96)], 1).astype(np.int32)
    xy = jnp.asarray(xy_np)
    for side, half in [(40, 19), (32, 15)]:
        w = np.asarray(patch_pallas.gather_windows(img, xy, side, half, interpret=True))
        ref_img = np.pad(img_np, side, mode="edge")
        for i, (x, y) in enumerate(xy_np):
            r0, c0 = y + side - half, x + side - half
            np.testing.assert_array_equal(
                w[i], ref_img[r0 : r0 + side, c0 : c0 + side]
            )
