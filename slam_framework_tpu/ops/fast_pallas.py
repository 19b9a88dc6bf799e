"""Fused FAST-9/16 strength + 3x3 NMS as a Pallas TPU kernel.

The XLA formulation in ops/fast.py materializes a (16, H, W) stack of shifted
images plus several same-sized rolling-min temporaries in HBM (~150 MB of traffic
at KITTI level 0). This kernel computes the same NMS'd strength map in one pass:
each grid step loads a row strip (+4-row halo) of the image from VMEM, forms the
16 Bresenham-circle diffs in registers, takes the 9-contiguous-arc min/max, does
3x3 non-max suppression, and writes only the final strip.

Semantics match fast.fast_strength_map -> fast.nms3x3 exactly EXCEPT within 4 px
of the left/right image border, where column shifts wrap around instead of
edge-padding; every caller masks a >= 16 px border afterwards
(ops/extractor.py DETECT_MARGIN, reference orb_extractor.cpp:707-713), so the
difference is never observable.

Batching: callers vmap the whole front-end over frame chunks. Pallas's generic
vmap rule inserts the batch dimension in a position Mosaic's (8, 128) tiling
rules reject (batch lands second-to-minor with block size 1), so vmap is routed
through `jax.custom_batching.custom_vmap` to a natively batched pallas_call
whose grid is (batch, strips) and whose blocks keep the image's (rows, cols) as
the two minor dimensions.

Reference for behavior: cv::FAST calls in ORBextractor::Compute
(src/orb_features/orb_extractor.cpp:750-757); see ops/fast.py for the strength
-map semantics shared by both implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_framework_tpu.ops.fast import ARC_LEN, CIRCLE

_HALO = 4  # 3 px Bresenham circle + 1 px NMS neighborhood
_STRIP = 32


def _roll_cols(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Circular column shift: out[y, x] = a[y, x - shift] (pltpu.roll needs a
    non-negative shift)."""
    return pltpu.roll(a, shift % a.shape[1], 1)


def _strength_rows(tile: jnp.ndarray, n_rows: int, row0: int) -> jnp.ndarray:
    """FAST-9 strength for rows [row0, row0 + n_rows) of `tile`.

    tile must cover [row0 - 3, row0 + n_rows + 3). Column shifts wrap (masked by
    the caller's border margin)."""
    center = tile[row0 : row0 + n_rows, :]
    diffs = []
    for dy, dx in CIRCLE:
        sh = tile[row0 + dy : row0 + dy + n_rows, :]
        if dx:
            sh = _roll_cols(sh, -dx)
        diffs.append(sh - center)

    # Incremental arc folding keeps the live set at 16 diffs + 2 accumulators
    # (the log-step window-min used in fast.py holds ~48 live strips and blows
    # the 16 MB VMEM budget). Bright strength is max_i min_arc(d); dark strength
    # is max_i min_arc(-d) = -min_i max_arc(d), so one pass over the arcs
    # computes both without materializing negated copies.
    bright = None
    dark_neg = None
    for i in range(16):
        arc = [diffs[(i + j) % 16] for j in range(ARC_LEN)]
        arc_min = functools.reduce(jnp.minimum, arc)
        arc_max = functools.reduce(jnp.maximum, arc)
        bright = arc_min if bright is None else jnp.maximum(bright, arc_min)
        dark_neg = arc_max if dark_neg is None else jnp.minimum(dark_neg, arc_max)
    return jnp.maximum(bright, -dark_neg)


def _kernel(img_ref, out_ref, *, strip: int):
    """img_ref block is one whole pre-padded image (1, Hp + 2*_HALO, W); every
    strip reads [i*strip, strip + 2*_HALO) rows so all in-tile offsets are
    static."""
    i = pl.program_id(1)
    tile = img_ref[0, pl.ds(i * strip, strip + 2 * _HALO), :]
    # strength on strip + 1-row halo each side (for NMS vertical neighbors):
    # image rows [i*strip - 1, i*strip + strip + 1) = tile rows [_HALO-1, ...)
    s = _strength_rows(tile, strip + 2, _HALO - 1)
    center = s[1 : strip + 1, :]
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = s[1 + dy : 1 + dy + strip, :]
            if dx:
                n = _roll_cols(n, -dx)
            neigh.append(n)
    keep = center > functools.reduce(jnp.maximum, neigh)
    out_ref[0, :, :] = jnp.where(keep, center, 0.0)


def _batched_impl(imgs: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) f32 -> (B, H, W) f32 NMS'd strength maps."""
    B, H, W = imgs.shape
    strip = _STRIP
    n_strips = pl.cdiv(H, strip)
    pad_h = n_strips * strip - H
    # halo rows top and bottom keep every strip's read statically shaped; the
    # padding rows produce garbage strengths that the caller's border mask kills
    imgs = jnp.pad(imgs.astype(jnp.float32), ((0, 0), (_HALO, _HALO + pad_h), (0, 0)))
    Hp = n_strips * strip
    # The input block is the whole padded image with an index map constant in
    # the strip index, so Pallas keeps it resident in VMEM across the inner
    # grid dimension (one HBM fetch per image, not per strip).
    out = pl.pallas_call(
        functools.partial(_kernel, strip=strip),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W), jnp.float32),
        grid=(B, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, Hp + 2 * _HALO, W), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, strip, W), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        # The resident whole-image input block (~2 MB at KITTI level 0) plus
        # double-buffered output strips brushes the default 16 MB scoped-VMEM
        # ceiling at batch >= 2; v5e has 128 MB of VMEM, so raise the cap.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        # Mosaic needs a real TPU; the CPU test mesh runs the interpreter.
        interpret=jax.default_backend() == "cpu",
    )(imgs)
    return out[:, :H]


@jax.custom_batching.custom_vmap
def fast_nms_strength(img: jnp.ndarray) -> jnp.ndarray:
    """NMS'd FAST-9 strength map, (H, W) f32 -> (H, W) f32.

    Equivalent to fast.nms3x3(fast.fast_strength_map(img)) away from the border.
    """
    return _batched_impl(img[None])[0]


@fast_nms_strength.def_vmap
def _fast_nms_strength_vmap(axis_size, in_batched, img):
    del axis_size
    (batched,) = in_batched
    if not batched:
        return fast_nms_strength(img), False
    return _batched_impl(img), True
