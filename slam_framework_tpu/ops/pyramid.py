"""Batched image pyramid + Gaussian blur.

TPU-native replacement for ORBextractor::ComputePyramid
(reference: src/orb_features/orb_extractor.cpp:1051-1076) and the pre-descriptor
GaussianBlur(7x7, sigma=2) (orb_extractor.cpp:1030 area). The pyramid is a Python list
of per-level arrays (static distinct shapes — one XLA program per image geometry), all
fp32, built with bilinear resize like OpenCV INTER_LINEAR.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, num_levels: int, scale_factor: float):
    """Static per-level (H, W). Matches the reference's round(dim / scale^l)."""
    shapes = []
    for lvl in range(num_levels):
        inv = 1.0 / (scale_factor**lvl)
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return shapes


def build_pyramid(img: jnp.ndarray, num_levels: int, scale_factor: float) -> List[jnp.ndarray]:
    """img (H, W) fp32 -> list of per-level fp32 arrays, level 0 == img.

    Each level is resized from the previous one (cascaded, like the reference) which
    acts as mild low-pass filtering versus resizing from level 0 directly.
    """
    shapes = level_shapes(img.shape[0], img.shape[1], num_levels, scale_factor)
    levels = [img]
    for lvl in range(1, num_levels):
        prev = levels[-1]
        levels.append(jax.image.resize(prev, shapes[lvl], method="linear"))
    return levels


@functools.lru_cache(maxsize=8)
def _gauss_kernel(ksize: int, sigma: float):
    """1D Gaussian taps matching cv2.getGaussianKernel."""
    ax = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(ax**2) / (2.0 * sigma**2))
    k = k / k.sum()
    # numpy, not jnp: jnp constants made under a jit trace would leak via the cache
    return k.astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with replicate padding, (H, W) fp32."""
    k = jnp.asarray(_gauss_kernel(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    # Convolve rows then cols via conv_general_dilated on (1, 1, H, W).
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    return x


def scale_factors(num_levels: int, scale_factor: float) -> np.ndarray:
    return np.asarray([scale_factor**l for l in range(num_levels)], dtype=np.float32)


def features_per_level(num_features: int, num_levels: int, scale_factor: float) -> Sequence[int]:
    """Geometric feature budget per level (reference: orb_extractor.cpp ctor logic):
    n_l proportional to (1/scale)^l, remainder to the last level."""
    f = 1.0 / scale_factor
    n0 = num_features * (1.0 - f) / (1.0 - f**num_levels)
    counts = []
    total = 0
    for lvl in range(num_levels - 1):
        c = int(round(n0 * (f**lvl)))
        counts.append(c)
        total += c
    counts.append(max(num_features - total, 0))
    return counts
