from sp_orb_slam_tpu.eval import ate  # noqa: F401
