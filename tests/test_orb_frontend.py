"""ORB front-end tests: FAST vs cv2 golden, orientation, BRIEF properties.

SURVEY.md §4 mandates golden tests of the perception kernels against OpenCV outputs.
Exact bit-parity with cv2 is not required (different selection strategy); we assert
strong agreement on detections and descriptor invariances instead.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from slam_framework_tpu.config import OrbConfig
from slam_framework_tpu.ops import brief, extractor, fast, orient, pyramid, select


@pytest.fixture(scope="module")
def test_image(tmp_path_factory):
    """Synthetic textured image: random blobs + corners, reproducible."""
    rng = np.random.default_rng(7)
    img = np.zeros((240, 320), np.uint8)
    # random rectangles and circles give strong corners + texture
    for _ in range(60):
        x, y = rng.integers(10, 300), rng.integers(10, 220)
        w, h = rng.integers(5, 40), rng.integers(5, 40)
        val = int(rng.integers(30, 255))
        cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)), val, -1)
    for _ in range(40):
        x, y = int(rng.integers(10, 310)), int(rng.integers(10, 230))
        cv2.circle(img, (x, y), int(rng.integers(3, 12)), int(rng.integers(0, 255)), -1)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    noise = rng.normal(0, 3, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def test_fast_matches_cv2(test_image):
    """Our dense FAST-9 map should agree with cv2 FAST (nms on) to ~1px."""
    thresh = 20
    score = fast.nms3x3(fast.fast_score_map(jnp.asarray(test_image, jnp.float32), thresh))
    score = fast.mask_border(score, 3)
    ours = np.argwhere(np.asarray(score) > 0)  # (n, 2) [y, x]

    det = cv2.FastFeatureDetector_create(threshold=thresh, nonmaxSuppression=True)
    kps = det.detect(test_image)
    cv_pts = np.array([[kp.pt[1], kp.pt[0]] for kp in kps])  # [y, x]

    assert len(cv_pts) > 50, "test image too bland"
    # Every cv2 corner should have one of ours within 1.5 px (NMS tie-breaks differ).
    d = np.linalg.norm(cv_pts[:, None, :] - ours[None, :, :], axis=-1).min(axis=1)
    agree = np.mean(d <= 1.5)
    assert agree > 0.9, f"only {agree:.2%} of cv2 FAST corners reproduced"
    # And we should not hallucinate wildly more corners than cv2.
    assert len(ours) < 3 * len(cv_pts)


def test_fast_score_is_max_threshold_property(test_image):
    """Corner at threshold t must imply corner at t' < t; strength map = max valid t."""
    img = jnp.asarray(test_image, jnp.float32)
    s20 = np.asarray(fast.fast_score_map(img, 20))
    s7 = np.asarray(fast.fast_score_map(img, 7))
    # everywhere s20 is a corner, s7 must be too, with the same strength
    mask = s20 > 0
    np.testing.assert_allclose(s7[mask], s20[mask])
    assert (s7 > 0).sum() > (s20 > 0).sum()


def test_nms_keeps_local_maxima():
    s = jnp.asarray(
        [[0, 0, 0, 0], [0, 5, 4, 0], [0, 3, 9, 0], [0, 0, 0, 0]], jnp.float32
    )
    out = np.asarray(fast.nms3x3(s))
    assert out[2, 2] == 9
    assert out[1, 1] == 0  # 5 is not the max of its neighborhood (9 adjacent)


def test_select_uniform_is_spatially_spread():
    """With uniform scores, selection must cover all cells, not cluster."""
    rng = np.random.default_rng(0)
    score = jnp.asarray(rng.uniform(0.1, 1.0, (128, 128)), jnp.float32)
    sel = select.select_uniform(score, score, n_target=16, cell=32)
    assert bool(jnp.all(sel.valid))
    cells = set()
    for x, y in np.asarray(sel.xy):
        cells.add((y // 32, x // 32))
    assert len(cells) == 16  # 4x4 grid fully covered: one kp per cell first


def test_select_low_threshold_fallback():
    """Cells empty at hi threshold fall back to lo-threshold corners."""
    hi = np.zeros((64, 64), np.float32)
    lo = np.zeros((64, 64), np.float32)
    hi[10, 10] = 5.0  # only cell (0,0) has a hi corner
    lo[10, 10] = 5.0
    lo[40, 40] = 2.0  # cell (1,1) only at lo threshold
    sel = select.select_uniform(jnp.asarray(hi), jnp.asarray(lo), n_target=2, cell=32)
    pts = {tuple(p) for p in np.asarray(sel.xy)[np.asarray(sel.valid)]}
    assert (10, 10) in pts and (40, 40) in pts


def test_ic_angle_matches_gradient_direction():
    """A linear intensity ramp's IC angle must point along the gradient."""
    h = w = 64
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for theta in [0.0, np.pi / 4, np.pi / 2, -2.0]:
        img = np.cos(theta) * xs + np.sin(theta) * ys
        a = float(orient.ic_angles(jnp.asarray(img), jnp.asarray([[32, 32]], jnp.int32))[0])
        diff = np.angle(np.exp(1j * (a - theta)))
        assert abs(diff) < 0.05, (theta, a)


def test_ic_angle_rotation_consistency(test_image):
    """Rotating the image by 90 deg shifts IC angles by ~90 deg."""
    img = np.asarray(test_image, np.float32)
    rot = np.rot90(img, k=-1).copy()  # clockwise
    pt = np.array([[160, 120]], np.int32)  # center
    a0 = float(orient.ic_angles(jnp.asarray(img), jnp.asarray(pt))[0])
    # center maps to itself under exact center rotation for square? use square crop
    sq = img[:240, :240]
    rot = np.rot90(sq, k=-1).copy()
    c = np.array([[120, 120]], np.int32)
    a0 = float(orient.ic_angles(jnp.asarray(sq), jnp.asarray(c))[0])
    a1 = float(orient.ic_angles(jnp.asarray(rot), jnp.asarray(c))[0])
    diff = np.angle(np.exp(1j * (a1 - a0 - np.pi / 2)))
    assert abs(diff) < 0.15


def test_brief_pack_unpack_roundtrip(rng):
    bits = jnp.asarray(rng.integers(0, 2, (16, 256)), jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    words = jnp.sum(bits.reshape(-1, 8, 32) * weights, axis=-1, dtype=jnp.uint32)
    back = brief.unpack_bits(words)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


def test_brief_descriptor_rotation_invariance(test_image):
    """Descriptor computed with correct angle must be stable under image rotation."""
    sq = np.asarray(test_image[:240, :240], np.float32)
    blurred = np.asarray(pyramid.gaussian_blur(jnp.asarray(sq)))
    rot = np.rot90(blurred, k=-1).copy()

    pts = np.array([[120, 120], [80, 100], [150, 60]], np.int32)
    a0 = orient.ic_angles(jnp.asarray(blurred), jnp.asarray(pts))
    d0 = brief.brief_descriptors(jnp.asarray(blurred), jnp.asarray(pts), a0)

    # Points map under clockwise rot90: (x, y) -> (H-1-y, x) for HxH image
    pts_r = np.stack([240 - 1 - pts[:, 1], pts[:, 0]], axis=-1).astype(np.int32)
    a1 = orient.ic_angles(jnp.asarray(rot), jnp.asarray(pts_r))
    d1 = brief.brief_descriptors(jnp.asarray(rot), jnp.asarray(pts_r), a1)

    b0 = np.asarray(brief.unpack_bits(d0))
    b1 = np.asarray(brief.unpack_bits(d1))
    hamming = (b0 != b1).sum(axis=1)
    assert np.all(hamming < 60), hamming  # matched ORB pairs are typically < 50 apart


def test_extractor_end_to_end(test_image):
    cfg = OrbConfig(num_features=500, num_levels=4)
    ext = extractor.OrbExtractor(cfg)
    feats = ext(jnp.asarray(test_image))
    assert feats.xy.shape == (500, 2)
    assert feats.desc.shape == (500, 8)
    n_valid = int(jnp.sum(feats.valid))
    assert n_valid > 300, f"only {n_valid} features on a textured image"
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert xy[:, 0].max() < test_image.shape[1]
    assert xy[:, 1].max() < test_image.shape[0]
    # multiple octaves must be populated
    octs = np.unique(np.asarray(feats.octave)[np.asarray(feats.valid)])
    assert len(octs) >= 3
    # second call with same shape: no recompile crash, deterministic
    feats2 = ext(jnp.asarray(test_image))
    np.testing.assert_array_equal(np.asarray(feats.desc), np.asarray(feats2.desc))


def test_features_per_level_sums_to_total():
    counts = pyramid.features_per_level(2000, 8, 1.2)
    assert sum(counts) == 2000
    assert all(c > 0 for c in counts)
    assert counts[0] > counts[-1]


def test_frontend_undistorts_keypoints(test_image):
    """The front-end outputs undistorted coordinates when distortion coefficients
    are set (UndistortKeyPoints, frame.cpp:614-641) and raw ones when all-zero."""
    import dataclasses

    from slam_framework_tpu.config import CameraConfig, CapacityConfig, SlamConfig
    from slam_framework_tpu.geometry import projection
    from slam_framework_tpu.pipeline.frame import MonoFrontend

    img = jnp.asarray(test_image)
    H, W = test_image.shape
    base = SlamConfig(
        camera=CameraConfig(fx=300.0, fy=300.0, cx=W / 2, cy=H / 2, width=W, height=H),
        orb=OrbConfig(num_features=256, num_levels=4),
        capacity=CapacityConfig(max_features=256),
    )
    fd_raw = MonoFrontend(base)(img)
    dist = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera, k1=-0.1, k2=0.02, p1=1e-3, p2=-5e-4)
    )
    fe_d = MonoFrontend(dist)
    fd_dist = fe_d(img)
    # same detections (identical image), coordinates undistorted
    expected = projection.undistort_points(
        fd_raw.xy, fe_d.K,
        jnp.asarray([-0.1, 0.02, 1e-3, -5e-4, 0.0], jnp.float32),
    )
    valid = np.asarray(fd_raw.valid)
    np.testing.assert_allclose(
        np.asarray(fd_dist.xy)[valid], np.asarray(expected)[valid], atol=1e-3
    )
    # zero-coefficient config is the identity (no extra ops traced)
    assert np.array_equal(np.asarray(fd_raw.xy), np.asarray(MonoFrontend(base)(img).xy))
