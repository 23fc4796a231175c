from sp_orb_slam_tpu.slam import frame, map, kernels, tracking, local_mapping, system  # noqa: F401
