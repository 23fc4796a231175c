from sp_orb_slam_tpu.models import superpoint, weights  # noqa: F401
