"""Rotated BRIEF (rBRIEF) 256-bit descriptors, batched over all keypoints.

TPU-native replacement for ORBextractor::computeOrbDescriptor
(reference: src/orb_features/orb_extractor.cpp:49-88) using the standard 256-pair ORB
sampling pattern (`orb_pattern.npy` — the public OpenCV `bit_pattern_31_` constant,
coordinates in [-13, 12], also hardcoded in the reference :91-349). Each pair's two
sample points are rotated by the keypoint orientation (rounded to integer offsets,
matching the reference's cvRound sampling), read from the blurred image, and compared:
bit = I(p_a) < I(p_b).

Descriptors are packed 256 bits -> 8 x uint32, little-endian within each word and
word-major in pair order: bit j of word w corresponds to pattern pair (w*32 + j).
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

MAX_ROTATED_OFFSET = 19  # ceil(13 * sqrt(2)); image must be padded by this for sampling

_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "orb_pattern.npy")


@functools.lru_cache(maxsize=1)
def pattern():
    """(256, 4) int32: x_a, y_a, x_b, y_b sample offsets per descriptor bit."""
    return np.load(_PATTERN_PATH)


@functools.lru_cache(maxsize=1)
def _pattern_cols():
    # numpy, not jnp: jnp constants made under a jit trace would leak via the cache
    p = pattern().astype(np.float32)
    return p[:, 0], p[:, 1], p[:, 2], p[:, 3]


def brief_descriptors(img_blur: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Compute (N, 8) uint32 packed descriptors.

    img_blur: (H, W) fp32 Gaussian-blurred level image.
    xy: (N, 2) int32 keypoint coords in level pixels.
    angles: (N,) fp32 orientation in radians.
    """
    h, w = img_blur.shape
    pad = MAX_ROTATED_OFFSET
    padded = jnp.pad(img_blur, pad, mode="edge")

    xa, ya, xb, yb = (jnp.asarray(c) for c in _pattern_cols())
    ca = jnp.cos(angles)[:, None]
    sa = jnp.sin(angles)[:, None]

    # Rotated integer offsets, same rounding as the reference's cvRound.
    def rot(px, py):
        rx = jnp.round(px[None, :] * ca - py[None, :] * sa).astype(jnp.int32)
        ry = jnp.round(px[None, :] * sa + py[None, :] * ca).astype(jnp.int32)
        return rx, ry

    rxa, rya = rot(xa, ya)  # (N, 256)
    rxb, ryb = rot(xb, yb)

    x0 = xy[:, 0:1] + pad
    y0 = xy[:, 1:2] + pad
    ia = padded[y0 + rya, x0 + rxa]  # (N, 256) gather
    ib = padded[y0 + ryb, x0 + rxb]
    bits = (ia < ib).astype(jnp.uint32)  # (N, 256)

    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    words = jnp.sum(bits.reshape(-1, 8, 32) * weights, axis=-1, dtype=jnp.uint32)
    return words


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) {0,1} uint8, inverse of the packing above."""
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (desc[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.uint8)
