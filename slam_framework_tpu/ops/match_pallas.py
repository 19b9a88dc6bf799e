"""Streaming gated projection matching as a Pallas TPU kernel.

TPU-native replacement for the hot path of OrbMatcher::SearchByProjection over the
local map (reference: src/orb_features/orb_matcher.cpp:13-103) and OrbMatcher::Fuse
(:804-954). The XLA formulation (pipeline/track_ops.py + matching/matcher.py)
materializes several (P, N) = (16384, 2048) distance/gate/inversion matrices in HBM
(~1 GB of traffic per frame). This kernel streams over row (map-point) tiles: each
tile's Hamming block comes from one int8 MXU matmul, is gated in VMEM, reduced to the
tile's per-row best feature, and folded into a running per-feature (column) minimum —
HBM sees only the (P,)/(N,) vectors.

Match semantics are identical to the XLA path:
  1. each gated map point picks its best (min Hamming <= max_dist) feature,
  2. each feature keeps the closest point among those that picked it
(= matcher.gated_match + resolve_duplicate_columns + _invert_matches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # plain float: jnp constants would be captured as tracers by the kernel

_TILE = 512  # map points per grid step


def _kernel(
    a_bits_ref,   # (TILE, 256) int8 — this tile's map-point descriptor bits
    na_ref,       # (TILE, 1) f32 — popcount of each row descriptor
    row_uv_ref,   # (TILE, 2) f32 — projected (u, v)
    row_rad_ref,  # (TILE, 1) f32 — window radius (<= 0 disables the row)
    row_lvl_ref,  # (TILE, 1) f32 — predicted octave
    row_z_ref,    # (TILE, 1) f32 — projected depth
    b_bits_ref,   # (N, 256) int8 — feature descriptor bits
    nb_ref,       # (1, N) f32
    col_xy_ref,   # (N, 2) f32
    col_oct_ref,  # (1, N) f32
    col_depth_ref,  # (1, N) f32 (-1 = no stereo depth)
    col_ok_ref,   # (1, N) f32 (1.0 = feature eligible)
    best_dist_ref,  # out (1, N) f32 running per-column best distance
    best_row_ref,   # out (1, N) f32 running per-column best row index
    *,
    tile: int,
    max_dist: float,
    depth_tol: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        best_dist_ref[:] = jnp.full_like(best_dist_ref, BIG)
        best_row_ref[:] = jnp.full_like(best_row_ref, -1.0)

    a = a_bits_ref[:]                     # (T, 256)
    b = b_bits_ref[:]                     # (N, 256)
    dots = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )                                     # (T, N)
    ham = na_ref[:] + nb_ref[:] - 2.0 * dots.astype(jnp.float32)

    du = row_uv_ref[:, 0:1] - col_xy_ref[:, 0][None, :]
    dv = row_uv_ref[:, 1:2] - col_xy_ref[:, 1][None, :]
    rad = row_rad_ref[:]
    d_oct = col_oct_ref[:] - row_lvl_ref[:]
    gate = (
        (jnp.abs(du) < rad)
        & (jnp.abs(dv) < rad)
        & (rad > 0.0)
        & (d_oct >= -1.0)
        & (d_oct <= 1.0)
        & (col_ok_ref[:] > 0.5)
    )
    if depth_tol > 0.0:
        # stereo depth consistency (Fuse): feature depth must agree with point depth
        z = row_z_ref[:]
        dep = col_depth_ref[:]
        gate &= (dep <= 0.0) | (
            jnp.abs(z - dep) < depth_tol * jnp.maximum(z, 1.0)
        )

    d = jnp.where(gate, ham, BIG)
    # per-row best column (each map point picks its best feature); the distance
    # threshold applies to the row's BEST match, not per pair (gated_match
    # semantics: a point whose best gated feature is too far matches nothing)
    row_min = jnp.min(d, axis=1, keepdims=True)            # (T, 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    row_arg = jnp.min(
        jnp.where(d == row_min, col_iota, d.shape[1]), axis=1, keepdims=True
    )                                                       # (T, 1)
    # contribution: row r offers row_min[r] to column row_arg[r] only
    contrib = jnp.where(
        (col_iota == row_arg) & (row_min <= max_dist), row_min, BIG
    )                                                       # (T, N)
    tile_min = jnp.min(contrib, axis=0)                     # (N,)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0)
    tile_row = jnp.min(
        jnp.where(contrib == tile_min[None, :], row_iota, contrib.shape[0]), axis=0
    )                                                       # (N,) local row
    glob_row = (tile_row + i * tile).astype(jnp.float32)

    better = tile_min < best_dist_ref[0, :]
    best_row_ref[0, :] = jnp.where(better, glob_row, best_row_ref[0, :])
    best_dist_ref[0, :] = jnp.where(better, tile_min, best_dist_ref[0, :])


@functools.partial(
    jax.jit, static_argnames=("max_dist", "depth_tol")
)
def projection_best_match(
    a_bits: jnp.ndarray,    # (P, 256) int8 map-point descriptor bits
    na: jnp.ndarray,        # (P,) f32 popcounts
    row_uv: jnp.ndarray,    # (P, 2) f32 projected pixel coords
    row_radius: jnp.ndarray,  # (P,) f32, <= 0 disables the row entirely
    row_lvl: jnp.ndarray,   # (P,) f32 predicted octave
    row_z: jnp.ndarray,     # (P,) f32 projected depth
    b_bits: jnp.ndarray,    # (N, 256) int8 feature bits
    nb: jnp.ndarray,        # (N,) f32
    col_xy: jnp.ndarray,    # (N, 2) f32
    col_oct: jnp.ndarray,   # (N,) f32
    col_depth: jnp.ndarray,  # (N,) f32
    col_ok: jnp.ndarray,    # (N,) f32
    *,
    max_dist: float,
    depth_tol: float = 0.0,
):
    """Returns (assoc, dist): per-feature best map-point row (int32, -1 none) and
    its Hamming distance (f32, BIG if none)."""
    P = a_bits.shape[0]
    N = b_bits.shape[0]
    tile = min(_TILE, P)
    n_tiles = pl.cdiv(P, tile)
    pad = n_tiles * tile - P
    if pad:
        a_bits = jnp.pad(a_bits, ((0, pad), (0, 0)))
        na = jnp.pad(na, (0, pad))
        row_uv = jnp.pad(row_uv, ((0, pad), (0, 0)))
        row_radius = jnp.pad(row_radius, (0, pad))  # 0 radius -> disabled
        row_lvl = jnp.pad(row_lvl, (0, pad))
        row_z = jnp.pad(row_z, (0, pad))

    row_spec = lambda i: (i, 0)
    full = lambda i: (0, 0)
    dist, row = pl.pallas_call(
        functools.partial(
            _kernel, tile=tile, max_dist=float(max_dist), depth_tol=float(depth_tol)
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 256), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 256), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
        # Mosaic needs a real TPU; the CPU test mesh runs the interpreter.
        interpret=jax.default_backend() == "cpu",
    )(
        a_bits,
        na[:, None],
        row_uv,
        row_radius[:, None],
        row_lvl[:, None],
        row_z[:, None],
        b_bits,
        nb[None, :],
        col_xy,
        col_oct[None, :].astype(jnp.float32),
        col_depth[None, :],
        col_ok[None, :],
    )
    assoc = jnp.where(dist[0] < BIG, row[0].astype(jnp.int32), -1)
    return assoc, dist[0]
