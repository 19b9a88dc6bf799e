from slam_framework_tpu.geometry import se3, sim3, projection, triangulation  # noqa: F401
