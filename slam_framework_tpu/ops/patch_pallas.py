"""Pallas TPU kernel: batched keypoint patch-window extraction.

The ORB front-end needs one small window per keypoint twice per image —
31x31 patches for intensity-centroid orientation (ops/orient.py) and 40x40
windows for rotated-BRIEF sampling (ops/brief.py). The XLA formulation
(vmap over jax.lax.dynamic_slice) lowers to a general gather costing ~4.8 ms
per 2000-keypoint image on TPU — the single largest term in the front-end
(windows alone were 9.5 of the 24 ms/frame device cost).

Mosaic only allows VMEM loads at (8, 128)-tile-aligned dynamic offsets, so
the kernel reads an ALIGNED superset block per keypoint — rows from
8*floor(y/8), 256 lanes from 128*floor(x/128) — then shifts the true origin
to (0, 0) with dynamic lane/sublane rolls (tpu.dynamic_rotate) and writes the
side x side corner. The whole (padded) level image sits in VMEM (~3 MB at
KITTI level 0), keypoint coordinates ride as scalar prefetch, and no gather
is ever materialized.

Reference equivalent: the interleaved patch loops of IC_Angle and
computeOrbDescriptor (src/orb_features/orb_extractor.cpp:18-88).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16       # keypoints per grid step
_LANES = 128
_SUB = 8
_RCOLS = 2 * _LANES  # aligned read width (covers side<=128 at any dx)


def _read_rows(side: int) -> int:
    return ((side + _SUB - 1) // _SUB + 1) * _SUB  # side + up to 7 of misalignment


def _kernel(yx_ref, img_ref, out_ref, *, side: int):
    i = pl.program_id(0)
    rs = _read_rows(side)
    y = yx_ref[i, 0]
    x = yx_ref[i, 1]
    y0 = (y // _SUB) * _SUB
    x0 = (x // _LANES) * _LANES
    a = img_ref[pl.ds(y0, rs), pl.ds(x0, _RCOLS)]
    a = pltpu.roll(a, -(y - y0), 0)
    a = pltpu.roll(a, -(x - x0), 1)
    out_ref[0] = a[:side, :side]


@functools.partial(jax.jit, static_argnames=("side", "interpret"))
def _gather(img_aligned: jnp.ndarray, yx: jnp.ndarray, side: int,
            interpret: bool = False) -> jnp.ndarray:
    N = yx.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, side=side),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, side, side), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N, side, side), jnp.float32),
        interpret=interpret,
    )(yx, img_aligned)


def gather_windows(img: jnp.ndarray, xy: jnp.ndarray, side: int, half: int,
                   interpret: bool = False) -> jnp.ndarray:
    """(N, side, side) f32 windows; window row/col 0 sits at keypoint - half.

    img: (H, W) f32 level image (unpadded). xy: (N, 2) int32 keypoint (x, y)
    centers — out-of-image windows read edge-padded values, matching the
    XLA paths' jnp.pad(..., mode='edge').
    """
    H, W = img.shape
    rs = _read_rows(side)
    # `half` of top/left margin puts window corner (center - half) at padded
    # coordinate == center (never negative); bottom/right margin covers the
    # largest aligned (rs, 256) read from any corner
    T_r = H + half + rs
    T_c = (W + half + _RCOLS + _LANES - 1) // _LANES * _LANES
    padded = jnp.pad(img, ((half, T_r - H - half), (half, T_c - W - half)),
                     mode="edge")
    corners = jnp.stack([xy[:, 1], xy[:, 0]], axis=-1)  # (row, col) = center
    N = corners.shape[0]
    Np = (N + TILE - 1) // TILE * TILE
    if Np != N:
        corners = jnp.pad(corners, ((0, Np - N), (0, 0)))
    out = _gather(padded, corners.astype(jnp.int32), side, interpret=interpret)
    return out[:N] if Np != N else out


def available() -> bool:
    # Opt-in while the kernel is being qualified on real hardware: interpret
    # mode is bit-exact vs the XLA path (tests/test_pallas_kernels.py), but
    # the dev tunnel's remote Mosaic compiler has crashed on some variants of
    # this kernel — keep the XLA gather as the default until the compiled
    # path is revalidated (set SLAM_PATCH_PALLAS=1 to enable).
    import os

    if os.environ.get("SLAM_PATCH_PALLAS", "0") != "1":
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False
