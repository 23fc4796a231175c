from sp_orb_slam_tpu.ops import nms, covariance, matching  # noqa: F401
