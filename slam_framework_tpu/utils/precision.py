"""Full-precision matmul helpers for geometry-critical math.

On TPU, jnp default matmul precision routes fp32 through the MXU as bf16x bf16 passes,
which is fine for descriptor scoring but catastrophic for pose/triangulation math
(pixel-coordinate normal equations span ~1e6 dynamic range; observed DLT error on a
v5e went from <2 cm at HIGHEST to ~5 m at default). All Lie/geometry/BA modules use
these wrappers; throughput-bound descriptor kernels deliberately do not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

einsum = functools.partial(jnp.einsum, precision=HIGHEST)
matmul = functools.partial(jnp.matmul, precision=HIGHEST)
