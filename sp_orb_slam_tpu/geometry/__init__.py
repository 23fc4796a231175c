from sp_orb_slam_tpu.geometry import se3, camera, triangulation, twoview  # noqa: F401
