from lidar_odometry_demo_tpu.ops import se3  # noqa: F401
