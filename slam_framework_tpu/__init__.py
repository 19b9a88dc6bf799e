"""TPU-native visual SLAM engine (JAX / XLA / Pallas / pjit).

A brand-new implementation of the capabilities of the reference C++ ORB-SLAM2-style
framework (ThorsteinnJonsson/SLAM_framework, see SURVEY.md): ORB front-end, descriptor
matching, bag-of-words place recognition, motion-only / local / global bundle adjustment
and Sim3 pose-graph optimization — all as batched, fixed-shape JAX programs designed for
the MXU/VPU, with multi-chip scaling via jax.sharding meshes.

Design stance (SURVEY.md §7): the map is arrays + fixed capacities + masks, not a pointer
graph; "threads" are pipeline stages; RANSAC is batched hypotheses, not sequential loops.
"""

__version__ = "0.1.0"

from slam_framework_tpu.config import SlamConfig, CameraConfig, OrbConfig  # noqa: F401
