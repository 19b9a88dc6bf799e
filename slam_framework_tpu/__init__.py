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

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the deployment TPU compiles remotely (~20-60 s
# per program shape); caching makes every process after the first start warm.
# Opt out with SLAM_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("SLAM_TPU_NO_COMPILE_CACHE"):
    import platform as _platform

    # Scope by hostname AND a CPU-feature fingerprint: CPU AOT artifacts embed
    # the compile machine's ISA features, and loading one compiled elsewhere
    # can hard-abort the process (observed: SIGABRT in
    # compilation_cache.get_executable_and_time on entries carrying
    # +prefer-no-scatter from a different microarchitecture — containers can
    # share a nodename across machine types, so the hostname alone is not
    # enough).
    def _cpu_fingerprint() -> str:
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                flags = [l for l in f if l.startswith(("flags", "model name"))]
            return hashlib.sha1("".join(sorted(set(flags))).encode()).hexdigest()[:8]
        except OSError:
            return "nocpuinfo"

    _cache_dir = _os.environ.get(
        "SLAM_TPU_COMPILE_CACHE",
        _os.path.expanduser(
            f"~/.cache/slam_tpu_xla_{_platform.node()}_{_cpu_fingerprint()}"
        ),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older jax without the knobs — run uncached
        pass

from slam_framework_tpu.config import SlamConfig, CameraConfig, OrbConfig  # noqa: F401
