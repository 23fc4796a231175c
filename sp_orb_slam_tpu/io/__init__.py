from sp_orb_slam_tpu.io import dataset  # noqa: F401
